SELECT SUBSTR(UPPER(n_name), 1, 1) AS initial, COUNT(*) AS cnt
FROM nation
GROUP BY SUBSTR(UPPER(n_name), 1, 1)
ORDER BY initial;
