SELECT o_orderstatus, o_custkey % 2 AS b, COUNT(*) AS cnt
FROM orders WHERE o_orderkey IN (282, 285, 299)
GROUP BY GROUPING SETS ((o_orderstatus), (o_custkey % 2), ())
ORDER BY o_orderstatus NULLS FIRST, b NULLS FIRST, cnt NULLS FIRST;
