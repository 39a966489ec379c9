SELECT c_mktsegment, COUNT(*) AS cnt, SUM(c_nationkey) AS total, MIN(c_nationkey) AS lo, MAX(c_nationkey) AS hi
FROM customer WHERE c_nationkey BETWEEN 4 AND 9
GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST;
