SELECT MAX(l_orderkey) AS mx, MIN(l_orderkey) AS mn FROM lineitem WHERE l_orderkey = -1;
