SELECT a.n_name, a.n_regionkey FROM nation a
WHERE a.n_regionkey = 2 AND a.n_nationkey > 5
ORDER BY a.n_nationkey;
