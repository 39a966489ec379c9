SELECT n_nationkey, UPPER(n_name) AS up, SUBSTR(n_name, 2, 4) AS mid,
  REPLACE(n_name, 'o', '_') AS rep, n_name || '#' || 'n' AS glued
FROM nation WHERE n_nationkey % 5 = 0
ORDER BY n_nationkey NULLS FIRST LIMIT 50;
