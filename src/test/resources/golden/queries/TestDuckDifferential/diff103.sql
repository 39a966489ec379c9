SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
WHERE o_custkey <= 42
GROUP BY o_orderpriority HAVING COUNT(*) > 2
ORDER BY o_orderpriority NULLS FIRST;
