SELECT DISTINCT o_orderstatus, o_custkey % 7 AS bucket FROM orders
WHERE LENGTH(o_orderstatus) > 5
ORDER BY o_orderstatus NULLS FIRST, bucket NULLS FIRST LIMIT 40;
