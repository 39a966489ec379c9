SELECT o_orderkey, o_custkey FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey < 5)
  AND o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
ORDER BY o_orderkey
LIMIT 20;
