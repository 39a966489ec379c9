SELECT n_nationkey, n_name FROM nation
WHERE n_regionkey NOT IN (
  SELECT r_regionkey FROM region
  WHERE r_regionkey IN (SELECT n_regionkey FROM nation WHERE n_nationkey < 3)
)
ORDER BY n_nationkey;
