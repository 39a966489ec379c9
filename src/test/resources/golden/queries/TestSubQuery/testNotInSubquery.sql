SELECT n_nationkey, n_name FROM nation
WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%')
ORDER BY n_nationkey;
