SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
WHERE o_custkey BETWEEN 70 AND 85
GROUP BY o_orderpriority HAVING COUNT(*) > 2
ORDER BY o_orderpriority NULLS FIRST;
