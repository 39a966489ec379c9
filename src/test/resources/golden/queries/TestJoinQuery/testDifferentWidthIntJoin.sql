SELECT c.c_custkey, n.n_name
FROM customer c JOIN nation n ON c.c_custkey = n.n_nationkey
ORDER BY c.c_custkey;
