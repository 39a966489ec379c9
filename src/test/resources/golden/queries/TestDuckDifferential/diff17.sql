SELECT DISTINCT c_name, c_nationkey % 4 AS bucket FROM customer
WHERE LENGTH(c_name) > 10
ORDER BY c_name NULLS FIRST, bucket NULLS FIRST LIMIT 40;
