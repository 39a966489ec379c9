SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
WHERE o_custkey > 30
GROUP BY o_orderpriority HAVING COUNT(*) > 5
ORDER BY o_orderpriority NULLS FIRST;
