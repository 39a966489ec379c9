SELECT n_regionkey,
       MIN(NULLIF(n_name, n_name)) AS min_null,
       MAX(NULLIF(n_name, n_name)) AS max_null,
       SUM(CAST(NULL AS INT8)) AS sum_null
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey;
