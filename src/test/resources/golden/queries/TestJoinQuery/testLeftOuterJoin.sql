SELECT r_name, n_name FROM region
LEFT OUTER JOIN nation ON r_regionkey = n_regionkey AND n_nationkey < 3
ORDER BY r_name, n_name NULLS LAST;
