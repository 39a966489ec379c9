SELECT r_regionkey % 2 AS g, MIN(r_name) AS lo, MAX(r_name) AS hi, SUM(LENGTH(r_name)) AS lensum
FROM region WHERE SUBSTR(r_name, 1, 1) <> 'z'
GROUP BY r_regionkey % 2 ORDER BY g NULLS FIRST;
