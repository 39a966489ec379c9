SELECT l_orderkey, a.o_custkey, p_name
FROM lineitem, part, (SELECT o_orderkey, o_custkey FROM orders) a
WHERE l_partkey = p_partkey AND l_orderkey = a.o_orderkey AND l_orderkey < 40
ORDER BY l_orderkey, o_custkey, p_name;
