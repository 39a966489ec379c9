SELECT o_orderkey,
  ROW_NUMBER() OVER w AS rn,
  SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS running
FROM orders WHERE o_orderkey < 10
WINDOW w AS (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey;
