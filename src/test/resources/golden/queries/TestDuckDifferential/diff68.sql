SELECT c.c_custkey, o.o_orderkey FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderkey > c.c_custkey + 9
WHERE c.c_custkey IN (7, 10, 24)
ORDER BY c.c_custkey NULLS FIRST, o.o_orderkey NULLS FIRST LIMIT 80;
