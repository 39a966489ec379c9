SELECT r_regionkey, UPPER(r_name) AS up, SUBSTR(r_name, 2, 2) AS mid,
  REPLACE(r_name, 'a', '_') AS rep, r_name || '#' || 'n' AS glued
FROM region WHERE r_regionkey <= 4
ORDER BY r_regionkey NULLS FIRST LIMIT 50;
