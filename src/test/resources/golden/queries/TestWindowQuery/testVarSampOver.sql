SELECT l_orderkey, ROUND(VAR_SAMP(l_linenumber) OVER (PARTITION BY l_orderkey), 6) AS vs FROM lineitem ORDER BY l_orderkey, vs LIMIT 20;
