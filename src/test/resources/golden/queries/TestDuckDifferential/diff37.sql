SELECT n_nationkey, UPPER(n_name) AS up, SUBSTR(n_name, 2, 2) AS mid,
  REPLACE(n_name, 'e', '_') AS rep, n_name || '#' || 'n' AS glued
FROM nation WHERE n_nationkey <= 15
ORDER BY n_nationkey NULLS FIRST LIMIT 50;
