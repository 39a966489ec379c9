SELECT COUNT(1) AS cnt FROM lineitem WHERE l_orderkey = -1;
