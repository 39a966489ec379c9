SELECT v FROM (
  SELECT n_nationkey AS v FROM nation
  UNION
  SELECT r_regionkey AS v FROM region
) t ORDER BY v LIMIT 12;
