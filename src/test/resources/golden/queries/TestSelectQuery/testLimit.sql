SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 10;
