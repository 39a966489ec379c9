SELECT o_orderstatus, MIN(o_orderdate) AS first_dt, MAX(o_orderdate) AS last_dt
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
