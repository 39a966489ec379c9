SELECT c_custkey % 2 AS g, MIN(c_name) AS lo, MAX(c_name) AS hi, SUM(LENGTH(c_name)) AS lensum
FROM customer WHERE c_name >= 'F'
GROUP BY c_custkey % 2 ORDER BY g NULLS FIRST;
