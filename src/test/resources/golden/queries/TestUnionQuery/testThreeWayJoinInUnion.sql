SELECT o_orderkey FROM (
  SELECT orders.o_orderkey FROM orders
  JOIN lineitem ON orders.o_orderkey = lineitem.l_orderkey
  JOIN customer ON orders.o_custkey = customer.c_custkey
  WHERE orders.o_orderkey < 50
  UNION ALL
  SELECT nation.n_nationkey FROM nation
) t ORDER BY o_orderkey;
