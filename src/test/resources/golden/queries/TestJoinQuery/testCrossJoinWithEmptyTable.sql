SELECT r.r_regionkey, e.n_name
FROM region r CROSS JOIN (
  SELECT n_name FROM nation WHERE n_nationkey > 999
) e
ORDER BY r.r_regionkey;
