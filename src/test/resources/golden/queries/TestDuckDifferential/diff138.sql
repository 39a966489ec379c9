SELECT c_custkey, c_mktsegment,
  SUM(c_custkey) OVER (PARTITION BY c_mktsegment ORDER BY c_custkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
FROM customer WHERE c_custkey % 2 = 0
ORDER BY c_custkey NULLS FIRST LIMIT 70;
