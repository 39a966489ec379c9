SELECT c_name FROM customer
WHERE c_nationkey IN (
  SELECT n_nationkey FROM nation WHERE n_name LIKE 'NATION_1%' AND n_regionkey IN (
    SELECT count(*) - 1 FROM region WHERE r_regionkey > 0 AND r_regionkey < 3))
ORDER BY c_name;
