SELECT c_custkey, split_part(c_name, '#', 1) AS prefix, split_part(c_name, '#', 2) AS num FROM customer ORDER BY c_custkey LIMIT 6;
