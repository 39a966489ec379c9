SELECT n_regionkey + 1 AS a, n_regionkey + 1 AS b, COUNT(*) AS cnt
FROM nation
GROUP BY n_regionkey + 1
ORDER BY a;
