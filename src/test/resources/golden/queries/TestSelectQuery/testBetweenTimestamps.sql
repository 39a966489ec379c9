SELECT o_orderkey, o_orderdate
FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '2021-02-01 00:00:00' AND TIMESTAMP '2021-02-05 23:59:59'
  AND o_orderkey < 400
ORDER BY o_orderkey;
