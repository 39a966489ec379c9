SELECT n_name, length(n_name) AS ln FROM nation ORDER BY ln, n_name;
