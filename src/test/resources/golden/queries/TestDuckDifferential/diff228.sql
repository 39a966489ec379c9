SELECT n.n_nationkey, r.r_regionkey FROM nation n
CROSS JOIN region r
WHERE n.n_regionkey <> r.r_regionkey AND r.r_regionkey >= 3
ORDER BY n.n_nationkey NULLS FIRST, r.r_regionkey NULLS FIRST;
