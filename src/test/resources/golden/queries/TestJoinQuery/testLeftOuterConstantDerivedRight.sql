SELECT c_custkey, o.o_orderkey, 'val' AS val
FROM customer LEFT OUTER JOIN (SELECT * FROM orders) o ON c_custkey = o.o_orderkey
WHERE c_custkey < 40
ORDER BY c_custkey, o_orderkey;
