SELECT l_orderkey FROM lineitem WHERE l_orderkey < 5 GROUP BY l_orderkey ORDER BY l_orderkey;
