SELECT 'nation' AS src, COUNT(*) AS cnt FROM nation
UNION ALL
SELECT 'region' AS src, COUNT(*) AS cnt FROM region
ORDER BY src;
