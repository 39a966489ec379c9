SELECT * FROM (
  SELECT SUM(l_orderkey) + SUM(l_partkey) AS total
  FROM lineitem
  GROUP BY l_orderkey + l_partkey
) t1
ORDER BY total
LIMIT 20;
