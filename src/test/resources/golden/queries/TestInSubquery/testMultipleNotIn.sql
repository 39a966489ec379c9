SELECT n_nationkey, n_name FROM nation
WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region WHERE r_regionkey < 2)
  AND n_nationkey NOT IN (SELECT n_regionkey + 20 FROM nation WHERE n_regionkey > 2)
ORDER BY n_nationkey;
