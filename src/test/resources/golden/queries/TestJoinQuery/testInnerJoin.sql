SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' ORDER BY n_name;
