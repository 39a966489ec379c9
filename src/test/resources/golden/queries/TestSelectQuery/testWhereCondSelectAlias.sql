SELECT l_orderkey AS orderkey, l_partkey FROM lineitem WHERE orderkey = 1 ORDER BY l_partkey;
