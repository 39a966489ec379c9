SELECT s.s_suppkey,
       COALESCE(l.total, 0) AS total_qty
FROM supplier s LEFT OUTER JOIN (
  SELECT l_suppkey, SUM(CAST(l_quantity AS INT8)) AS total
  FROM lineitem WHERE l_quantity > 49 GROUP BY l_suppkey
) l ON s.s_suppkey = l.l_suppkey
WHERE s.s_suppkey < 15
ORDER BY s.s_suppkey;
