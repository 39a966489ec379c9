SELECT v FROM (
  SELECT n_nationkey AS v FROM nation WHERE n_nationkey < 0
  UNION ALL
  SELECT r_regionkey AS v FROM region
) t ORDER BY v;
