SELECT c_custkey AS v, 'a' AS tag FROM customer WHERE c_custkey <= 36
UNION ALL
SELECT c_custkey AS v, 'b' AS tag FROM customer WHERE c_custkey % 5 = 0
ORDER BY v NULLS FIRST, tag NULLS FIRST LIMIT 80;
