SELECT n_nationkey, n_regionkey,
       ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey % 3 DESC, n_name ASC) AS rn
FROM nation
ORDER BY n_regionkey, rn;
