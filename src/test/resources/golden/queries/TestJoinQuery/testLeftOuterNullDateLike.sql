SELECT c_custkey, orders.o_orderkey, coalesce(orders.o_orderstatus, 'N/A') AS st, orders.o_orderdate
FROM customer LEFT OUTER JOIN orders ON c_custkey = o_orderkey
WHERE orders.o_orderdate IS NOT NULL AND orders.o_orderdate LIKE '1996%'
ORDER BY c_custkey, o_orderkey;
