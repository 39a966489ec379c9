SELECT n_regionkey, n_nationkey,
  FIRST_VALUE(n_name) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS first_name,
  LAST_VALUE(n_name) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_name
FROM nation ORDER BY n_regionkey, n_nationkey;
