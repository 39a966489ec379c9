SELECT AVG(CAST(cnt AS DECIMAL(18,4))) AS avg_orders_per_customer FROM (
  SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
) t;
