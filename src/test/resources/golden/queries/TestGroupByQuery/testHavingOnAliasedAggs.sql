SELECT l_orderkey, AVG(l_partkey) AS total, SUM(l_linenumber) AS num FROM lineitem GROUP BY l_orderkey HAVING AVG(l_partkey) >= 50 OR SUM(l_linenumber) = 3 ORDER BY l_orderkey, total LIMIT 25;
