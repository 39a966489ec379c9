SELECT r_regionkey, UPPER(r_name) AS up, SUBSTR(r_name, 2, 3) AS mid,
  REPLACE(r_name, 'i', '_') AS rep, r_name || '#' || 'r' AS glued
FROM region WHERE r_regionkey % 6 = 1
ORDER BY r_regionkey NULLS FIRST LIMIT 50;
