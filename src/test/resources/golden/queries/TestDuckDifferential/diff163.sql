SELECT n_nationkey, n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_custkey % 11 = 0)
ORDER BY n_nationkey NULLS FIRST;
