SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_shipdate <= '1996-03-22'
ORDER BY l_orderkey, l_linenumber LIMIT 20;
