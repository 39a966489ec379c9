SELECT l_orderkey, ROUND(STDDEV_POP(l_linenumber) OVER (PARTITION BY l_orderkey), 6) AS sd FROM lineitem ORDER BY l_orderkey, sd LIMIT 20;
