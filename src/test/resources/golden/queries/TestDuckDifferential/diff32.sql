SELECT DISTINCT c_mktsegment, c_nationkey % 9 AS bucket FROM customer
WHERE LENGTH(c_mktsegment) > 7
ORDER BY c_mktsegment NULLS FIRST, bucket NULLS FIRST LIMIT 40;
