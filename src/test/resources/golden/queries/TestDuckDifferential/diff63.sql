SELECT n_nationkey, n_name,
  (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_custkey > 3) AS n_cust
FROM nation n
ORDER BY n_nationkey NULLS FIRST;
