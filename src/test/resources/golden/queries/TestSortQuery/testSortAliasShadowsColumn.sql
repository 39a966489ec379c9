SELECT n_nationkey AS n_regionkey, n_name FROM nation
WHERE n_nationkey < 6
ORDER BY n_regionkey DESC;
