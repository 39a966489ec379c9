SELECT c_custkey,
  LAG(c_custkey, 1, -1) OVER (ORDER BY c_custkey) AS prev,
  LEAD(c_custkey, 1, -2) OVER (ORDER BY c_custkey) AS nxt
FROM customer WHERE c_custkey IN (92, 95, 109)
ORDER BY c_custkey NULLS FIRST LIMIT 60;
