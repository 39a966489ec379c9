SELECT SUM(CAST(b.l_quantity AS INT8)) AS qty_above_avg
FROM lineitem b
JOIN orders c ON c.o_orderkey = b.l_orderkey
JOIN (
  SELECT l_orderkey, AVG(l_quantity) AS avg_quantity
  FROM lineitem
  GROUP BY l_orderkey
) f ON c.o_orderkey = f.l_orderkey
WHERE c.o_orderkey > 0 AND b.l_quantity > f.avg_quantity;
