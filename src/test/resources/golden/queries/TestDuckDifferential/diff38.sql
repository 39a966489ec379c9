SELECT o_orderpriority, COUNT(DISTINCT o_orderkey % 5) AS ndist,
  SUM(CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END) AS hits,
  COUNT(*) AS cnt
FROM orders WHERE o_orderkey BETWEEN 317 AND 503
GROUP BY o_orderpriority ORDER BY o_orderpriority NULLS FIRST;
