SELECT c_custkey, e.o_orderkey
FROM customer LEFT OUTER JOIN (SELECT * FROM orders WHERE o_orderkey < 0) e ON c_custkey = e.o_custkey
ORDER BY c_custkey LIMIT 10;
