SELECT v, COUNT(*) AS c FROM (
  SELECT n_regionkey AS v FROM nation
  UNION
  SELECT n_regionkey AS v FROM nation
  UNION ALL
  SELECT r_regionkey AS v FROM region
) t GROUP BY v ORDER BY v;
