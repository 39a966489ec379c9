SELECT c.c_custkey, c.c_nationkey FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderkey < 160
WHERE o.o_orderkey IS NULL AND c.c_custkey > 44
ORDER BY c.c_custkey NULLS FIRST LIMIT 60;
