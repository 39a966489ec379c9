SELECT n_nationkey, n_name FROM nation ORDER BY n_name;
