SELECT n_nationkey, n_name FROM nation
WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
  AND n_nationkey NOT IN (SELECT s_nationkey FROM supplier WHERE s_suppkey < 5)
ORDER BY n_nationkey;
