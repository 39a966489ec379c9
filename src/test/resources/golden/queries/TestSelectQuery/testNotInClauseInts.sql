SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey < 30 AND l_partkey NOT IN (2,3) ORDER BY l_orderkey, l_partkey;
