SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
  CASE WHEN o_orderkey % 3 = 0 THEN 'tri' WHEN o_orderkey % 4 = 1 THEN 'mod' ELSE 'rest' END AS cls
FROM orders WHERE o_orderkey <= 1027
ORDER BY o_orderkey NULLS FIRST LIMIT 70;
