SELECT o_orderkey, COALESCE(NULLIF(o_custkey % 2, 0), -1) AS bucket
FROM orders WHERE o_orderkey <= 1081
ORDER BY o_orderkey NULLS FIRST LIMIT 80;
