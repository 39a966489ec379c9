SELECT l_orderkey AS orderkey FROM lineitem WHERE l_orderkey = 1 ORDER BY orderkey;
