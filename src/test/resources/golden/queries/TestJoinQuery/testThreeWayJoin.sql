SELECT c_name, n_name, r_name FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_custkey <= 10 ORDER BY c_name;
