SELECT o_orderstatus, COUNT(DISTINCT o_orderpriority) AS n_prio FROM orders
GROUP BY o_orderstatus ORDER BY o_orderstatus;
