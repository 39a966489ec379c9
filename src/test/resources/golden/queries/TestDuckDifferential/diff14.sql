SELECT o_orderpriority, COUNT(DISTINCT o_orderkey % 4) AS ndist,
  SUM(CASE WHEN o_orderkey % 4 = 0 THEN 1 ELSE 0 END) AS hits,
  COUNT(*) AS cnt
FROM orders WHERE o_orderkey IN (388, 391, 405)
GROUP BY o_orderpriority ORDER BY o_orderpriority NULLS FIRST;
