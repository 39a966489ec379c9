SELECT c.c_custkey, n.n_name FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_custkey IN (15, 18, 32)
ORDER BY c.c_custkey NULLS FIRST, n.n_name NULLS FIRST LIMIT 60;
