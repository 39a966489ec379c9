SELECT CASE WHEN o_custkey % 4 = 0 THEN 'z' WHEN o_custkey % 4 = 1 THEN 'o' ELSE 'r' END AS cls,
  COUNT(*) AS cnt, SUM(o_orderkey) AS s
FROM orders WHERE o_orderkey > 293
GROUP BY CASE WHEN o_custkey % 4 = 0 THEN 'z' WHEN o_custkey % 4 = 1 THEN 'o' ELSE 'r' END ORDER BY cls NULLS FIRST;
