SELECT l_orderkey,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS quantity,
  COUNT(DISTINCT l_partkey) AS partkeys,
  COUNT(DISTINCT l_suppkey) AS suppkeys,
  MAX(l_quantity) AS max_qty,
  l_returnflag
FROM lineitem
GROUP BY l_returnflag, l_orderkey
ORDER BY l_orderkey, l_returnflag
LIMIT 20;
