SELECT DISTINCT c_mktsegment, c_custkey % 6 AS bucket FROM customer
WHERE c_mktsegment >= 'A'
ORDER BY c_mktsegment NULLS FIRST, bucket NULLS FIRST LIMIT 40;
