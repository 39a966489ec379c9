SELECT n.n_nationkey, r.r_name FROM nation n
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_regionkey >= 2
ORDER BY n.n_nationkey NULLS FIRST, r.r_name NULLS FIRST;
