SELECT n_name FROM nation WHERE n_name LIKE 'A%' ORDER BY n_name;
