SELECT l_orderkey, l_linenumber FROM lineitem
WHERE (l_orderkey, l_linenumber) IN (SELECT o_orderkey, 1 FROM orders WHERE o_custkey < 10)
ORDER BY l_orderkey, l_linenumber
LIMIT 20;
