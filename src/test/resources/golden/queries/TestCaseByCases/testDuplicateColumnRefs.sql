SELECT l_orderkey, l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey < 4 ORDER BY l_orderkey, l_linenumber;
