SELECT l_orderkey, MAX(l_orderkey) AS maximum, COUNT(DISTINCT l_linenumber) AS uniq FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 25;
