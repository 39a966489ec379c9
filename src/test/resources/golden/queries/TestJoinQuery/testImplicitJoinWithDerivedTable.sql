SELECT l.l_orderkey, a.o_custkey, p.p_name
FROM lineitem l, part p, (SELECT o_orderkey, o_custkey FROM orders) a
WHERE l.l_partkey = p.p_partkey
  AND l.l_orderkey = a.o_orderkey
  AND l.l_orderkey < 12
ORDER BY l.l_orderkey, a.o_custkey, p.p_name;
