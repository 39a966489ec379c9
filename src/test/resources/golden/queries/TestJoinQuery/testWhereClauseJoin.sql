SELECT n.n_name, r.r_name
FROM nation n, region r
WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey < 6
ORDER BY n.n_name;
