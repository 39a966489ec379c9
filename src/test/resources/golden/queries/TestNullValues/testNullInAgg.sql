SELECT o_orderstatus, SUM(CAST(NULLIF(o_orderkey % 5, 0) AS DECIMAL(10,0))) AS s
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
