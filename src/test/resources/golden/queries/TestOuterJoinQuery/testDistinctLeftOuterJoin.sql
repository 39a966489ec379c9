SELECT DISTINCT c_custkey, o.o_orderkey, o.o_orderstatus
FROM customer LEFT OUTER JOIN orders o ON c_custkey = o_orderkey
ORDER BY c_custkey, o_orderkey
LIMIT 25;
