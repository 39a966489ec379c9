SELECT o_orderkey, o_orderpriority,
  COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_same_prio
FROM orders WHERE o_orderkey < 25 ORDER BY o_orderkey;
