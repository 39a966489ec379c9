SELECT l_orderkey, p_name, n_name
FROM lineitem, orders, part, customer, nation
WHERE l_orderkey = o_orderkey
  AND l_partkey = p_partkey
  AND o_custkey = c_custkey
  AND c_nationkey = n_nationkey
  AND l_orderkey < 15
ORDER BY l_orderkey, p_name, n_name;
