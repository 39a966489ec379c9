SELECT o_orderkey, COALESCE(NULLIF(o_custkey % 3, 0), -1) AS bucket
FROM orders WHERE o_orderkey BETWEEN 992 AND 1369
ORDER BY o_orderkey NULLS FIRST LIMIT 80;
