SELECT ROUND(AVG(l_quantity), 6) AS avg_dbl, ROUND(AVG(l_linenumber), 6) AS avg_int, ROUND(AVG(l_orderkey), 6) AS avg_long FROM lineitem WHERE l_orderkey < 100;
