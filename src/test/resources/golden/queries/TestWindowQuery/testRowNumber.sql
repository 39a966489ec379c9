SELECT n_regionkey, n_nationkey,
  ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn
FROM nation ORDER BY n_regionkey, n_nationkey;
