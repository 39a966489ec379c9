SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
WHERE o_custkey IN (6, 9, 23)
GROUP BY o_orderpriority HAVING COUNT(*) > 3
ORDER BY o_orderpriority NULLS FIRST;
