SELECT n_nationkey, n_name FROM nation WHERE n_regionkey <> 2 AND n_regionkey != 3 ORDER BY n_nationkey LIMIT 10;
