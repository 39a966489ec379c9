SELECT l_orderkey + l_partkey AS merged FROM lineitem GROUP BY l_orderkey + l_partkey ORDER BY merged LIMIT 20;
