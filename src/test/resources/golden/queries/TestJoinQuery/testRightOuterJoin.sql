SELECT n_name, r_name FROM nation
RIGHT OUTER JOIN region ON n_regionkey = r_regionkey AND n_nationkey < 3
ORDER BY r_name, n_name NULLS LAST;
