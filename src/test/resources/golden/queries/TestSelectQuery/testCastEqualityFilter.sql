SELECT substr(l_orderkey::TEXT, 1, 1) AS a, substr(l_partkey::TEXT, 1, 1) AS b
FROM lineitem
WHERE substr(l_orderkey::TEXT, 1, 1) = substr(l_partkey::TEXT, 1, 1)
ORDER BY l_orderkey, l_linenumber LIMIT 20;
