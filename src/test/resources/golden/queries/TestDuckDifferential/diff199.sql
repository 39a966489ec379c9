SELECT o_custkey % 5 AS b, COUNT(*) AS cnt, MAX(o_orderkey) AS hi
FROM orders WHERE o_orderkey <= 868
GROUP BY o_custkey % 5
HAVING COUNT(*) > 2 AND MIN(o_orderkey) < 841
ORDER BY b NULLS FIRST;
