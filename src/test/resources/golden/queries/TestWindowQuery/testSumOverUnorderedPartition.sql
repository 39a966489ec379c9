SELECT n_nationkey, n_regionkey,
       SUM(n_nationkey) OVER (PARTITION BY n_regionkey) AS region_total
FROM nation
WHERE n_nationkey < 12
ORDER BY n_nationkey;
