SELECT o_custkey AS v, 'a' AS tag FROM orders WHERE o_custkey % 6 = 0
UNION ALL
SELECT o_custkey AS v, 'b' AS tag FROM orders WHERE o_custkey BETWEEN 173 AND 190
ORDER BY v NULLS FIRST, tag NULLS FIRST LIMIT 80;
