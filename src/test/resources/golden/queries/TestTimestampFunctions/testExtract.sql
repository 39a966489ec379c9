SELECT o_orderkey,
  EXTRACT(YEAR FROM o_orderdate) AS y,
  EXTRACT(MONTH FROM o_orderdate) AS m,
  EXTRACT(DAY FROM o_orderdate) AS d
FROM orders WHERE o_orderkey < 6 ORDER BY o_orderkey;
