SELECT o_orderkey,
  MIN(o_orderkey) OVER (ORDER BY o_orderkey ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS lo,
  MAX(o_orderkey) OVER (ORDER BY o_orderkey ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS hi
FROM orders WHERE o_orderkey % 6 = 0
ORDER BY o_orderkey NULLS FIRST LIMIT 70;
