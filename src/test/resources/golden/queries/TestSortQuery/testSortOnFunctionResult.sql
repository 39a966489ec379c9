SELECT n_name, length(n_name) AS len FROM nation ORDER BY length(n_name) DESC, n_name LIMIT 8;
