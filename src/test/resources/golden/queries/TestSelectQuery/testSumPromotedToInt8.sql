SELECT SUM(l_orderkey * 1000000) AS big FROM lineitem;
