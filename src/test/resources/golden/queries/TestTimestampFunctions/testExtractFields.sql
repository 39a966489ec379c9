SELECT o_orderkey,
       EXTRACT(YEAR FROM o_orderdate) AS yr,
       EXTRACT(MONTH FROM o_orderdate) AS mon,
       EXTRACT(DAY FROM o_orderdate) AS dy,
       EXTRACT(HOUR FROM o_orderdate) AS hr
FROM orders
WHERE o_orderkey < 8
ORDER BY o_orderkey;
