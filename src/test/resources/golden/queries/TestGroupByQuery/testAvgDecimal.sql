SELECT o_orderstatus, AVG(CAST(o_totalprice AS DECIMAL(18,2))) AS avg_price
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
