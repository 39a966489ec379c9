SELECT c_custkey, orders.o_orderkey, coalesce(orders.o_orderstatus, 'N/A') AS st, orders.o_orderdate
FROM customer LEFT OUTER JOIN orders ON c_custkey = o_orderkey
WHERE orders.o_orderkey = 100
ORDER BY c_custkey, o_orderkey;
