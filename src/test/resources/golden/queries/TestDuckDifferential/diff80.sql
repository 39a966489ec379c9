SELECT DISTINCT c_mktsegment, c_nationkey % 3 AS bucket FROM customer
WHERE c_mktsegment >= 'E'
ORDER BY c_mktsegment NULLS FIRST, bucket NULLS FIRST LIMIT 40;
