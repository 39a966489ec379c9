SELECT l.l_orderkey, l.l_linenumber
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_suppkey = l.l_partkey AND l.l_orderkey < 2000
ORDER BY l.l_orderkey, l.l_linenumber;
