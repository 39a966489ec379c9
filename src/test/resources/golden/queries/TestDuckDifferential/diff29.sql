SELECT c_name, COUNT(*) AS cnt, SUM(c_nationkey) AS total, MIN(c_nationkey) AS lo, MAX(c_nationkey) AS hi
FROM customer WHERE c_nationkey % 3 = 1
GROUP BY c_name ORDER BY c_name NULLS FIRST;
