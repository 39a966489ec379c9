SELECT n_nationkey, UPPER(n_name) AS up, SUBSTR(n_name, 2, 2) AS mid,
  REPLACE(n_name, 'o', '_') AS rep, n_name || '#' || 's' AS glued
FROM nation WHERE n_nationkey BETWEEN 4 AND 6
ORDER BY n_nationkey NULLS FIRST LIMIT 50;
