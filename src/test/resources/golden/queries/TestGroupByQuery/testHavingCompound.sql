SELECT l_suppkey, COUNT(*) AS cnt, SUM(CAST(l_quantity AS INT8)) AS qty
FROM lineitem
GROUP BY l_suppkey
HAVING COUNT(*) > 50 AND SUM(CAST(l_quantity AS INT8)) > 1500
ORDER BY l_suppkey;
