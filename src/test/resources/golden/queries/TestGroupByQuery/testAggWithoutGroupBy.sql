SELECT COUNT(*) + MAX(l_orderkey) AS merged FROM lineitem;
