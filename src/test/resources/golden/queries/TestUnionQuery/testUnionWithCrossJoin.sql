SELECT t.v, r_regionkey FROM (
  SELECT 1 AS v
  UNION ALL
  SELECT 2 AS v
) t CROSS JOIN region ORDER BY t.v, r_regionkey LIMIT 8;
