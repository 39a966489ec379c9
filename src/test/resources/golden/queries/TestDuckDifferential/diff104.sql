SELECT DISTINCT c_mktsegment, c_custkey % 3 AS bucket FROM customer
WHERE SUBSTR(c_mktsegment, 1, 1) <> 'q'
ORDER BY c_mktsegment NULLS FIRST, bucket NULLS FIRST LIMIT 40;
