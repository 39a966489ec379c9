SELECT l_orderkey, l_linenumber FROM lineitem
WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_linenumber = 7)
ORDER BY l_orderkey, l_linenumber
LIMIT 20;
