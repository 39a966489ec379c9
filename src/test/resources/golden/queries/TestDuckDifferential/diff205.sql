SELECT o_orderkey, COALESCE(NULLIF(o_custkey % 5, 0), -1) AS bucket
FROM orders WHERE o_orderkey IN (783, 786, 800)
ORDER BY o_orderkey NULLS FIRST LIMIT 80;
