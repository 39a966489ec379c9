SELECT DISTINCT o_orderstatus, o_custkey % 4 AS bucket FROM orders
WHERE LENGTH(o_orderstatus) > 7
ORDER BY o_orderstatus NULLS FIRST, bucket NULLS FIRST LIMIT 40;
