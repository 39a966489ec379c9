SELECT n_regionkey AS v, 'a' AS tag FROM nation WHERE n_regionkey % 2 = 0
UNION ALL
SELECT n_regionkey AS v, 'b' AS tag FROM nation WHERE n_regionkey IN (0, 3, 17)
ORDER BY v NULLS FIRST, tag NULLS FIRST LIMIT 80;
