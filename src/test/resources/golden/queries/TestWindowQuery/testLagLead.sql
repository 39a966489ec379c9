SELECT n_nationkey, n_regionkey,
  LAG(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS prev_key,
  LEAD(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS next_key
FROM nation ORDER BY n_regionkey, n_nationkey;
