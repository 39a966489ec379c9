SELECT o_custkey % 5 AS b, COUNT(*) AS cnt, MAX(o_orderkey) AS hi
FROM orders WHERE o_orderkey BETWEEN 258 AND 704
GROUP BY o_custkey % 5
HAVING COUNT(*) > 3 AND MIN(o_orderkey) < 366
ORDER BY b NULLS FIRST;
