SELECT DISTINCT o_orderpriority, o_orderkey % 6 AS bucket FROM orders
WHERE o_orderpriority LIKE '%e%'
ORDER BY o_orderpriority NULLS FIRST, bucket NULLS FIRST LIMIT 40;
