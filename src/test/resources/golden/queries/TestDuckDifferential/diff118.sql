SELECT CASE WHEN o_custkey % 5 = 0 THEN 'z' WHEN o_custkey % 5 = 1 THEN 'o' ELSE 'r' END AS cls,
  COUNT(*) AS cnt, SUM(o_orderkey) AS s
FROM orders WHERE o_orderkey % 5 = 0
GROUP BY CASE WHEN o_custkey % 5 = 0 THEN 'z' WHEN o_custkey % 5 = 1 THEN 'o' ELSE 'r' END ORDER BY cls NULLS FIRST;
