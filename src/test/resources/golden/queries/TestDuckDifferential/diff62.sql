SELECT DISTINCT o_orderpriority, o_custkey % 7 AS bucket FROM orders
WHERE o_orderpriority LIKE '%i%'
ORDER BY o_orderpriority NULLS FIRST, bucket NULLS FIRST LIMIT 40;
