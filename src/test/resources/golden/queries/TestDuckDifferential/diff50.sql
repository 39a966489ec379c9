SELECT o_orderstatus, COUNT(*) AS cnt, SUM(o_custkey) AS total, MIN(o_custkey) AS lo, MAX(o_custkey) AS hi
FROM orders WHERE o_custkey BETWEEN 57 AND 77
GROUP BY o_orderstatus ORDER BY o_orderstatus NULLS FIRST;
