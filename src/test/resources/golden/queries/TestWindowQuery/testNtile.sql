SELECT n_nationkey, NTILE(4) OVER (ORDER BY n_nationkey) AS quartile
FROM nation ORDER BY n_nationkey;
