SELECT c_custkey, c_name,
  ROW_NUMBER() OVER (PARTITION BY c_name ORDER BY c_custkey) AS rn,
  RANK() OVER (ORDER BY c_custkey % 4, c_custkey) AS rk
FROM customer WHERE c_custkey <= 68
ORDER BY c_custkey NULLS FIRST LIMIT 60;
