SELECT l_returnflag,
       SUM(CAST(l_quantity + l_linenumber AS INT8)) / COUNT(DISTINCT l_suppkey) AS per_supp,
       COUNT(DISTINCT l_suppkey) AS d_supp,
       AVG(CAST(l_quantity AS INT8)) AS avg_qty
FROM lineitem
WHERE l_orderkey < 300
GROUP BY l_returnflag
ORDER BY l_returnflag;
