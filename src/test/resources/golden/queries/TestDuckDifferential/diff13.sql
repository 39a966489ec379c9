SELECT n_regionkey AS v, 'a' AS tag FROM nation WHERE n_regionkey BETWEEN 49 AND 128
UNION ALL
SELECT n_regionkey AS v, 'b' AS tag FROM nation WHERE n_regionkey IN (97, 100, 114)
ORDER BY v NULLS FIRST, tag NULLS FIRST LIMIT 80;
