SELECT l_suppkey, SUM(CAST(l_quantity AS INT4)) AS total_qty
FROM lineitem
GROUP BY l_suppkey
ORDER BY l_suppkey
LIMIT 5;
