SELECT c_custkey, o.o_orderkey, 'val' AS val
FROM customer LEFT OUTER JOIN orders o ON c_custkey = o_orderkey AND o_orderkey < 5
ORDER BY c_custkey, o_orderkey LIMIT 12;
