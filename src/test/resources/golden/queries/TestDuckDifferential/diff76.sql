SELECT o_orderkey AS v, 'a' AS tag FROM orders WHERE o_orderkey IN (997, 1000, 1014)
UNION ALL
SELECT o_orderkey AS v, 'b' AS tag FROM orders WHERE o_orderkey BETWEEN 833 AND 1257
ORDER BY v NULLS FIRST, tag NULLS FIRST LIMIT 80;
