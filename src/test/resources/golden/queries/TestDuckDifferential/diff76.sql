SELECT n_regionkey AS v, 'a' AS tag FROM nation WHERE n_regionkey BETWEEN 2 AND 4
UNION ALL
SELECT n_regionkey AS v, 'b' AS tag FROM nation WHERE n_regionkey IN (0, 3, 17)
ORDER BY v NULLS FIRST, tag NULLS FIRST LIMIT 80;
