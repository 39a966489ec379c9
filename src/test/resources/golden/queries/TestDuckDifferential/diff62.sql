SELECT o_orderstatus, COUNT(DISTINCT o_orderkey % 2) AS ndist,
  SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS hits,
  COUNT(*) AS cnt
FROM orders WHERE o_orderkey IN (658, 661, 675)
GROUP BY o_orderstatus ORDER BY o_orderstatus NULLS FIRST;
