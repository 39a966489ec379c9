SELECT o_custkey AS v, 'a' AS tag FROM orders WHERE o_custkey <= 106
UNION ALL
SELECT o_custkey AS v, 'b' AS tag FROM orders WHERE o_custkey % 7 = 1
ORDER BY v NULLS FIRST, tag NULLS FIRST LIMIT 80;
