SELECT o_orderkey, to_char(o_orderdate, 'YYYY-MM') AS ym FROM orders
WHERE o_orderkey < 10 ORDER BY o_orderkey;
