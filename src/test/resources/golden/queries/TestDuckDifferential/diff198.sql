SELECT c_custkey, UPPER(SUBSTR(c_name, 1, 5)) AS pre,
  LENGTH(REPLACE(c_name, 'e', '')) AS shrunk
FROM customer WHERE SUBSTR(c_name, 1, 1) <> 'z'
ORDER BY c_custkey NULLS FIRST LIMIT 70;
