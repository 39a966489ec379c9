SELECT r.*, n.n_name FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey ORDER BY n.n_name LIMIT 10;
