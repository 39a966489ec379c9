SELECT l_returnflag,
       SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS revenue,
       SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,4))) AS charged
FROM lineitem
WHERE l_orderkey < 500
GROUP BY l_returnflag
ORDER BY l_returnflag;
