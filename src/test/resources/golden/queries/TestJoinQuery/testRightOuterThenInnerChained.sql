SELECT * FROM customer c
RIGHT OUTER JOIN (SELECT n_nationkey FROM nation) n ON n.n_nationkey = c.c_custkey
JOIN region r ON r.r_regionkey = c.c_custkey
ORDER BY c.c_custkey;
