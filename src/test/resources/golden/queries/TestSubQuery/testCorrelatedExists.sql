SELECT r_name FROM region r
WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey < 3)
ORDER BY r_name;
