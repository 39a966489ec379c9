SELECT c_custkey, UPPER(SUBSTR(c_mktsegment, 1, 3)) AS pre,
  LENGTH(REPLACE(c_mktsegment, 'e', '')) AS shrunk
FROM customer WHERE c_mktsegment LIKE '%u%'
ORDER BY c_custkey NULLS FIRST LIMIT 70;
