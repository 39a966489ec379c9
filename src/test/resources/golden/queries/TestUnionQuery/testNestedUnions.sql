SELECT v, COUNT(*) AS c FROM (
  SELECT r_regionkey AS v FROM region
  UNION ALL
  (SELECT n_regionkey AS v FROM nation
   UNION ALL
   SELECT n_regionkey AS v FROM nation)
) t GROUP BY v ORDER BY v;
