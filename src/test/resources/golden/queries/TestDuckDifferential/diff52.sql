SELECT c_custkey AS v, 'a' AS tag FROM customer WHERE c_custkey IN (30, 33, 47)
UNION ALL
SELECT c_custkey AS v, 'b' AS tag FROM customer WHERE c_custkey % 2 = 1
ORDER BY v NULLS FIRST, tag NULLS FIRST LIMIT 80;
