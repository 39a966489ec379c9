SELECT UPPER(LOWER(l_orderkey::text)) AS key, COUNT(1) AS total
FROM lineitem
GROUP BY key
ORDER BY UPPER(LOWER(l_orderkey::text)), total
LIMIT 15;
