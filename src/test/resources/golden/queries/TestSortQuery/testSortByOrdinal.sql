SELECT n_name, n_regionkey FROM nation ORDER BY 2 DESC, 1 ASC LIMIT 10;
