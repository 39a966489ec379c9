SELECT c_mktsegment, COUNT(DISTINCT c_custkey % 5) AS ndist,
  SUM(CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END) AS hits,
  COUNT(*) AS cnt
FROM customer WHERE c_custkey % 2 = 1
GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST;
