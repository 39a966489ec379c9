SELECT l_returnflag,
       SUM(CASE WHEN l_quantity > 25 THEN CAST(1 AS INT8) ELSE CAST(0 AS INT8) END) AS big_cnt,
       SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_quantity AS INT8) ELSE 0 END) AS discounted_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag;
