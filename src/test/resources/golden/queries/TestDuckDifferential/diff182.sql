SELECT c_custkey, UPPER(SUBSTR(c_name, 1, 5)) AS pre,
  LENGTH(REPLACE(c_name, 'a', '')) AS shrunk
FROM customer WHERE c_name LIKE '%i%'
ORDER BY c_custkey NULLS FIRST LIMIT 70;
