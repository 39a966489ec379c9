SELECT c_custkey FROM customer
WHERE c_nationkey IN (
  SELECT n_nationkey FROM nation
  WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'REGION_1'))
ORDER BY c_custkey
LIMIT 20;
