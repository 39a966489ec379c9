SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
WHERE o_custkey % 7 = 1
GROUP BY o_orderpriority HAVING COUNT(*) > 4
ORDER BY o_orderpriority NULLS FIRST;
