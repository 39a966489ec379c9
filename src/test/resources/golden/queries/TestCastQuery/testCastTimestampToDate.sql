SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d, CAST(CAST(o_orderdate AS DATE) AS TEXT) AS d_text
FROM orders
WHERE o_orderkey < 12
ORDER BY o_orderkey;
