SELECT l_returnflag, MIN(l_linestatus) AS mn, MAX(l_linestatus) AS mx FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
