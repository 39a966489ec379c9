SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS all_supp,
       COUNT(DISTINCT CASE WHEN l_quantity > 25 THEN l_suppkey ELSE NULL END) AS big_qty_supp
FROM lineitem
WHERE l_orderkey < 400
GROUP BY l_returnflag
ORDER BY l_returnflag;
