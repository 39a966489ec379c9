SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS d_supp,
       COUNT(DISTINCT l_partkey) AS d_part,
       SUM(CAST(l_quantity AS INT8)) AS total_qty
FROM lineitem
WHERE l_orderkey < 200
GROUP BY l_returnflag
ORDER BY l_returnflag;
