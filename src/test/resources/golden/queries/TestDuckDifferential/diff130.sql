SELECT o_orderkey, o_orderpriority,
  SUM(o_orderkey) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
FROM orders WHERE o_orderkey % 6 = 0
ORDER BY o_orderkey NULLS FIRST LIMIT 70;
