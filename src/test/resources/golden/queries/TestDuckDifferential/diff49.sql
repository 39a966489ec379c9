SELECT o_orderkey, UPPER(o_orderstatus) AS up, SUBSTR(o_orderstatus, 2, 3) AS mid,
  REPLACE(o_orderstatus, 'i', '_') AS rep, o_orderstatus || '#' || 's' AS glued
FROM orders WHERE o_orderkey IN (695, 698, 712)
ORDER BY o_orderkey NULLS FIRST LIMIT 50;
