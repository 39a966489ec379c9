SELECT l_returnflag, l_linestatus,
       COUNT(*) AS cnt,
       SUM(CAST(l_quantity AS INT8)) AS qty,
       RANK() OVER (PARTITION BY l_returnflag ORDER BY SUM(CAST(l_quantity AS INT8)) DESC) AS qty_rank
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus;
