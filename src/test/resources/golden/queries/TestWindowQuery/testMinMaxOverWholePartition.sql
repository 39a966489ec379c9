SELECT n_nationkey, n_regionkey,
       MIN(n_name) OVER (PARTITION BY n_regionkey) AS first_name,
       MAX(n_name) OVER (PARTITION BY n_regionkey) AS last_name
FROM nation
WHERE n_nationkey < 12
ORDER BY n_nationkey;
