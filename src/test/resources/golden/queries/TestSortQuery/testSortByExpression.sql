SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey < 10 ORDER BY l_orderkey * 10 + l_linenumber;
