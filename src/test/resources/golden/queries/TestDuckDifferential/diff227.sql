SELECT 'by_nation' AS src, CAST(c_nationkey AS BIGINT) AS g, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey
UNION ALL
SELECT 'by_mod', CAST(o_custkey % 5 AS BIGINT), COUNT(*)
FROM orders WHERE o_orderkey % 4 = 1 GROUP BY o_custkey % 5
ORDER BY src NULLS FIRST, g NULLS FIRST;
