SELECT v FROM (
  SELECT n_nationkey AS v FROM nation
  UNION ALL
  SELECT r_regionkey + 100 AS v FROM region
) t ORDER BY v DESC LIMIT 9;
