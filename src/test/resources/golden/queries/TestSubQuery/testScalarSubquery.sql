SELECT n_name FROM nation
WHERE n_regionkey = (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
ORDER BY n_name;
