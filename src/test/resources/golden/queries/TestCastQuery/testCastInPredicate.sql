SELECT o_orderkey, o_totalprice
FROM orders
WHERE CAST(o_totalprice AS INT8) BETWEEN 1000 AND 1050
ORDER BY o_orderkey;
