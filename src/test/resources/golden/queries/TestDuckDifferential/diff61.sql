SELECT n_nationkey, UPPER(n_name) AS up, SUBSTR(n_name, 2, 5) AS mid,
  REPLACE(n_name, 'o', '_') AS rep, n_name || '#' || 'n' AS glued
FROM nation WHERE n_nationkey IN (5, 8, 22)
ORDER BY n_nationkey NULLS FIRST LIMIT 50;
