SELECT o_custkey % 5 AS b, COUNT(*) AS cnt, MAX(o_orderkey) AS hi
FROM orders WHERE o_orderkey BETWEEN 397 AND 659
GROUP BY o_custkey % 5
HAVING COUNT(*) > 2 AND MIN(o_orderkey) < 566
ORDER BY b NULLS FIRST;
