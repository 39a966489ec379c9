SELECT DISTINCT c_name, c_custkey % 6 AS bucket FROM customer
WHERE LENGTH(c_name) > 6
ORDER BY c_name NULLS FIRST, bucket NULLS FIRST LIMIT 40;
