SELECT l.l_orderkey, o.o_orderkey, '201405' AS key1, '5-LOW' AS key2
FROM lineitem l LEFT OUTER JOIN orders o ON l.l_orderkey = o.o_orderkey AND o_orderpriority = '5-LOW'
WHERE l.l_orderkey < 30
ORDER BY l.l_orderkey, o.o_orderkey;
