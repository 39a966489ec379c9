(SELECT n_nationkey, n_name FROM nation WHERE n_nationkey = 1);
