SELECT c_custkey, c_mktsegment,
  ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS rn,
  RANK() OVER (ORDER BY c_custkey % 6, c_custkey) AS rk
FROM customer WHERE c_custkey IN (37, 40, 54)
ORDER BY c_custkey NULLS FIRST LIMIT 60;
