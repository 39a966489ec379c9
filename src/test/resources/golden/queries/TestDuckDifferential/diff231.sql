SELECT n_nationkey, n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_custkey % 3 = 0)
  AND NOT EXISTS (SELECT 1 FROM customer c2
    JOIN orders o ON o.o_custkey = c2.c_custkey
    WHERE c2.c_nationkey = n.n_nationkey AND o.o_orderkey > 1394)
ORDER BY n_nationkey NULLS FIRST;
