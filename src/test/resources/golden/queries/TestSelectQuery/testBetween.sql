SELECT o_orderkey, o_totalprice FROM orders
WHERE o_orderkey BETWEEN 100 AND 160 ORDER BY o_orderkey;
