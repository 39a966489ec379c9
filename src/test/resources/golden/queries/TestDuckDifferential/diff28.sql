SELECT r_regionkey AS v, 'a' AS tag FROM region WHERE r_regionkey BETWEEN 0 AND 2
UNION ALL
SELECT r_regionkey AS v, 'b' AS tag FROM region WHERE r_regionkey IN (0, 3, 17)
ORDER BY v NULLS FIRST, tag NULLS FIRST LIMIT 80;
