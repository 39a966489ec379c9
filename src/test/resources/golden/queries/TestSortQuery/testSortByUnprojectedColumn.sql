SELECT n_name FROM nation
WHERE n_nationkey < 10
ORDER BY n_regionkey DESC, n_nationkey;
