SELECT SUM(l_linenumber) + SUM(l_linenumber) AS doubled FROM lineitem GROUP BY l_orderkey ORDER BY doubled DESC LIMIT 10;
