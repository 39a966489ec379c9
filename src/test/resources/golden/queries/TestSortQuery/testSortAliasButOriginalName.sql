SELECT n_name AS nation_name, n_nationkey FROM nation
WHERE n_regionkey = 0
ORDER BY n_name;
