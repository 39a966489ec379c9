SELECT n_name AS n_nationkey, n_nationkey AS id FROM nation ORDER BY id LIMIT 5;
