SELECT l_returnflag, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
