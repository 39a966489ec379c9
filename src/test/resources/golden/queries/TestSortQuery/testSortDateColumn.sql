SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderkey < 15 ORDER BY o_orderdate, o_orderkey;
