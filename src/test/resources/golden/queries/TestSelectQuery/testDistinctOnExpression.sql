SELECT DISTINCT SUBSTR(n_name, 1, 7) AS prefix, n_regionkey
FROM nation
ORDER BY prefix, n_regionkey;
