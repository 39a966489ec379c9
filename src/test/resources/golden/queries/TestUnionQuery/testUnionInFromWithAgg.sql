SELECT SUM(v) AS s, MIN(v) AS mn, MAX(v) AS mx FROM (
  SELECT l_orderkey AS v FROM lineitem WHERE l_orderkey < 10
  UNION ALL
  SELECT o_orderkey AS v FROM orders WHERE o_orderkey < 10
) t;
