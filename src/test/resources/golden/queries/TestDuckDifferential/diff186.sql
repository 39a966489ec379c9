SELECT o_orderstatus, o_custkey % 4 AS b, COUNT(*) AS cnt
FROM orders WHERE o_orderkey % 3 = 1
GROUP BY GROUPING SETS ((o_orderstatus), (o_custkey % 4), ())
ORDER BY o_orderstatus NULLS FIRST, b NULLS FIRST, cnt NULLS FIRST;
