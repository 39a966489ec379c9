SELECT o_custkey % 2 AS b, COUNT(*) AS cnt, MAX(o_orderkey) AS hi
FROM orders WHERE o_orderkey > 374
GROUP BY o_custkey % 2
HAVING COUNT(*) > 1 AND MIN(o_orderkey) < 1022
ORDER BY b NULLS FIRST;
