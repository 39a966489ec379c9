SELECT l_orderkey, l_linenumber,
       ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus ORDER BY l_orderkey, l_linenumber) AS rn
FROM lineitem
WHERE l_orderkey < 15
ORDER BY l_orderkey, l_linenumber;
