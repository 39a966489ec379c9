SELECT c_custkey, n_nationkey, n_name
FROM customer JOIN nation ON c_custkey = n_nationkey
ORDER BY c_custkey;
