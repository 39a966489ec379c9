SELECT a.c_custkey, b.l_orderkey, c.o_orderkey, d.n_name, e.p_name
FROM customer a
LEFT OUTER JOIN (SELECT * FROM lineitem WHERE l_linenumber = 1) b ON a.c_custkey = b.l_orderkey
LEFT OUTER JOIN orders c ON b.l_orderkey = c.o_orderkey
LEFT OUTER JOIN nation d ON a.c_custkey = d.n_nationkey
LEFT OUTER JOIN part e ON e.p_partkey = a.c_custkey
WHERE a.c_custkey < 15
ORDER BY a.c_custkey, b.l_orderkey;
