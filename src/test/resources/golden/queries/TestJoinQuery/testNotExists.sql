SELECT r_name FROM region r
WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey > 20)
ORDER BY r_name;
