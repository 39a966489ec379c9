SELECT l_partkey, COUNT(*) AS cnt
FROM lineitem
GROUP BY l_partkey
ORDER BY cnt DESC, l_partkey
LIMIT 5;
