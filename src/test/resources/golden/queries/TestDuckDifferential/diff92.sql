SELECT c.c_custkey, o.o_orderkey FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderkey > c.c_custkey + 8
WHERE c.c_custkey % 4 = 0
ORDER BY c.c_custkey NULLS FIRST, o.o_orderkey NULLS FIRST LIMIT 80;
