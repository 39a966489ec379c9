SELECT n_nationkey, n_name FROM nation
WHERE (n_regionkey = 1 OR n_regionkey = 2) AND n_nationkey < 15
ORDER BY n_nationkey;
