SELECT o_orderkey, o_orderstatus,
  SUM(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
FROM orders WHERE o_orderkey IN (384, 387, 401)
ORDER BY o_orderkey NULLS FIRST LIMIT 70;
