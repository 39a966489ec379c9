SELECT l_linenumber, l_returnflag, l_linestatus, SUM(DISTINCT l_orderkey) AS dsum, COUNT(DISTINCT l_partkey) AS dcnt, SUM(l_orderkey) AS psum
FROM lineitem
GROUP BY l_linenumber, l_returnflag, l_linestatus
ORDER BY l_linenumber, l_returnflag, l_linestatus
LIMIT 30;
