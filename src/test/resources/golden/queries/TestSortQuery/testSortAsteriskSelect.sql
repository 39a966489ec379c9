SELECT * FROM nation
WHERE n_nationkey < 8
ORDER BY n_regionkey DESC, n_name;
