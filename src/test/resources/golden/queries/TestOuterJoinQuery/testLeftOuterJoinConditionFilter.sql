SELECT a.n_nationkey, a.n_name, b.c_custkey, b.c_nationkey
FROM nation a
LEFT OUTER JOIN customer b ON a.n_nationkey = b.c_custkey AND b.c_nationkey = 1
ORDER BY a.n_nationkey, b.c_custkey;
