SELECT n_nationkey % 6 AS g, MIN(n_name) AS lo, MAX(n_name) AS hi, SUM(LENGTH(n_name)) AS lensum
FROM nation WHERE SUBSTR(n_name, 1, 1) <> 'q'
GROUP BY n_nationkey % 6 ORDER BY g NULLS FIRST;
