SELECT l_orderkey, l_linenumber, l_returnflag,
       RANK() OVER (PARTITION BY l_orderkey ORDER BY l_returnflag) AS rk,
       DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_returnflag) AS drk
FROM lineitem
WHERE l_orderkey < 8
ORDER BY l_orderkey, l_linenumber;
