SELECT c_mktsegment, COUNT(*) AS cnt, SUM(c_custkey) AS total, MIN(c_custkey) AS lo, MAX(c_custkey) AS hi
FROM customer WHERE c_custkey > 325
GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST;
