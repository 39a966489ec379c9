SELECT c.c_name, o.o_orderkey, n.n_name
FROM customer c, orders o, nation n
WHERE c.c_custkey = o.o_custkey AND c.c_nationkey = n.n_nationkey
  AND o.o_orderkey < 20
ORDER BY o.o_orderkey;
