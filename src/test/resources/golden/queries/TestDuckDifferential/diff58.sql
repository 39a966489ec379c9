SELECT o_orderkey AS v, 'a' AS tag FROM orders WHERE o_orderkey IN (865, 868, 882)
UNION ALL
SELECT o_orderkey AS v, 'b' AS tag FROM orders WHERE o_orderkey <= 1235
ORDER BY v NULLS FIRST, tag NULLS FIRST LIMIT 80;
