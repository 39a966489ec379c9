SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey > l_partkey
ORDER BY l_orderkey, l_partkey, l_linenumber LIMIT 30;
