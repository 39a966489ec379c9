SELECT MIN(l_orderkey) AS mn_long, MAX(l_orderkey) AS mx_long, MIN(l_returnflag) AS mn_str, MAX(l_returnflag) AS mx_str FROM lineitem;
