SELECT n_nationkey, n_name FROM nation WHERE 1 = 0 ORDER BY n_nationkey;
