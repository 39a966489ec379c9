SELECT l_orderkey FROM lineitem WHERE l_partkey IN (2,3) ORDER BY l_orderkey;
