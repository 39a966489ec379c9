SELECT l_orderkey, l_partkey, l_orderkey + l_partkey AS plus FROM lineitem
WHERE l_orderkey < 3 ORDER BY l_orderkey, l_partkey, l_linenumber;
