SELECT l_returnflag, l_linestatus,
       SUM(CAST(l_quantity AS INT8)) AS quantity,
       COUNT(DISTINCT l_partkey) AS d_part,
       COUNT(DISTINCT l_suppkey) AS d_supp,
       MAX(CAST(l_quantity AS INT8)) AS max_qty
FROM lineitem
WHERE l_orderkey < 100
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus;
