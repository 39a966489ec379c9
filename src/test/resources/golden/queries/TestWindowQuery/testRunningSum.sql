SELECT o_orderkey, o_orderstatus,
  SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_orderstatus ORDER BY o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total
FROM orders WHERE o_orderkey < 30 ORDER BY o_orderstatus, o_orderkey;
