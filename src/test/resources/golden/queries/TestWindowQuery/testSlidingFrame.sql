SELECT o_orderkey,
  SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS window3
FROM orders WHERE o_orderkey < 15 ORDER BY o_orderkey;
