SELECT l_returnflag, ROUND(AVG(l_linenumber), 6) AS avg_ln FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
