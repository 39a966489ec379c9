SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS d_parts
FROM lineitem
WHERE l_orderkey < 500
GROUP BY l_suppkey
HAVING COUNT(DISTINCT l_partkey) >= 5
ORDER BY l_suppkey;
