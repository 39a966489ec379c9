SELECT r_regionkey AS v, 'a' AS tag FROM region WHERE r_regionkey > 1
UNION ALL
SELECT r_regionkey AS v, 'b' AS tag FROM region WHERE r_regionkey <= 3
ORDER BY v NULLS FIRST, tag NULLS FIRST LIMIT 80;
