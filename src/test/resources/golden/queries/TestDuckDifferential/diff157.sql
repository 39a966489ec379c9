SELECT o_orderkey,
  LAG(o_orderkey, 2, -1) OVER (ORDER BY o_orderkey) AS prev,
  LEAD(o_orderkey, 1, -2) OVER (ORDER BY o_orderkey) AS nxt
FROM orders WHERE o_orderkey IN (644, 647, 661)
ORDER BY o_orderkey NULLS FIRST LIMIT 60;
