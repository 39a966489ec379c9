SELECT o_orderkey, o_orderkey % 7 AS m, o_orderkey * 2 AS dbl, div(o_orderkey, 3) AS d
FROM orders WHERE o_orderkey < 20 ORDER BY o_orderkey;
