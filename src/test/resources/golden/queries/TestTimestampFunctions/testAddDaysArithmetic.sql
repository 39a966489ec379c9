SELECT o_orderkey,
       CAST(ADD_DAYS(o_orderdate, 30) AS TEXT) AS plus_month,
       CAST(ADD_DAYS(o_orderdate, -7) AS TEXT) AS minus_week
FROM orders
WHERE o_orderkey < 6
ORDER BY o_orderkey;
