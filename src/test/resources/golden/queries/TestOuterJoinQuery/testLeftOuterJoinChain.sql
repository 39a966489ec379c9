SELECT a.l_orderkey, a.l_linenumber, b.c_custkey, d.n_name
FROM lineitem a
LEFT OUTER JOIN customer b ON a.l_orderkey = b.c_custkey
LEFT OUTER JOIN nation d ON a.l_orderkey = d.n_nationkey
ORDER BY a.l_orderkey, a.l_linenumber, b.c_custkey
LIMIT 20;
