SELECT o_orderpriority, COUNT(*) AS cnt, SUM(o_custkey) AS total, MIN(o_custkey) AS lo, MAX(o_custkey) AS hi
FROM orders WHERE o_custkey <= 78
GROUP BY o_orderpriority ORDER BY o_orderpriority NULLS FIRST;
