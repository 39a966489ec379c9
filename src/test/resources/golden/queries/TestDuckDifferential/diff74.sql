SELECT o_orderpriority, COUNT(*) AS cnt, SUM(o_orderkey) AS total, MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi
FROM orders WHERE o_orderkey BETWEEN 857 AND 1353
GROUP BY o_orderpriority ORDER BY o_orderpriority NULLS FIRST;
