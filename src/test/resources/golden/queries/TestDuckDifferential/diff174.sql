SELECT c_custkey, UPPER(SUBSTR(c_mktsegment, 1, 6)) AS pre,
  LENGTH(REPLACE(c_mktsegment, 'a', '')) AS shrunk
FROM customer WHERE c_mktsegment LIKE '%a%'
ORDER BY c_custkey NULLS FIRST LIMIT 70;
