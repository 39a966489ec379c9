SELECT o_orderkey, o_orderpriority,
  ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS rn,
  RANK() OVER (ORDER BY o_orderkey % 6, o_orderkey) AS rk
FROM orders WHERE o_orderkey <= 407
ORDER BY o_orderkey NULLS FIRST LIMIT 60;
