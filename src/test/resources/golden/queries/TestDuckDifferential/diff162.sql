SELECT o_orderstatus, o_custkey % 5 AS b, COUNT(*) AS cnt
FROM orders WHERE o_orderkey IN (1008, 1011, 1025)
GROUP BY GROUPING SETS ((o_orderstatus), (o_custkey % 5), ())
ORDER BY o_orderstatus NULLS FIRST, b NULLS FIRST, cnt NULLS FIRST;
