SELECT c.c_custkey, n.n_name, rg.r_name FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region rg ON n.n_regionkey = rg.r_regionkey
WHERE c.c_custkey % 6 = 0 AND LENGTH(rg.r_name) > 9
ORDER BY c.c_custkey NULLS FIRST LIMIT 70;
