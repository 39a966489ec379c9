SELECT o_custkey % 4 AS b, COUNT(*) AS cnt, MAX(o_orderkey) AS hi
FROM orders WHERE o_orderkey BETWEEN 400 AND 876
GROUP BY o_custkey % 4
HAVING COUNT(*) > 3 AND MIN(o_orderkey) < 313
ORDER BY b NULLS FIRST;
