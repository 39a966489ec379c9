SELECT n_regionkey, n_nationkey,
       NTILE(2) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS half
FROM nation
ORDER BY n_regionkey, n_nationkey;
