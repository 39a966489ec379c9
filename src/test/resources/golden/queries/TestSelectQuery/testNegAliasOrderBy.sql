SELECT (-l_orderkey) AS l_orderkey FROM lineitem ORDER BY l_orderkey LIMIT 10;
