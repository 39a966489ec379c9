SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST;
