SELECT n_nationkey, n_name FROM nation
WHERE n_regionkey IN (
  SELECT r_regionkey FROM region WHERE r_regionkey = 0
  UNION
  SELECT r_regionkey FROM region WHERE r_regionkey = 4
)
ORDER BY n_nationkey;
