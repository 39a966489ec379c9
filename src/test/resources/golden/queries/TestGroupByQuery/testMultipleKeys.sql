SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt FROM orders
GROUP BY o_orderstatus, o_orderpriority ORDER BY o_orderstatus, o_orderpriority;
