SELECT 'day', 'day' AS key, l_orderkey, COUNT(*) AS cnt
FROM lineitem
GROUP BY 'day', l_orderkey
ORDER BY 'day', l_orderkey
LIMIT 10;
