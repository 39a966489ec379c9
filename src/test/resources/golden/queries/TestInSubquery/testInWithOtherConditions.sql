SELECT o_orderkey, o_orderstatus FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
  AND o_orderkey < 100
  AND o_totalprice > 1000
ORDER BY o_orderkey;
