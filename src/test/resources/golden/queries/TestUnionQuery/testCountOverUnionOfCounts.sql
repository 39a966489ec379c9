SELECT COUNT(*) AS cnt FROM (
  SELECT COUNT(*) AS total FROM orders
  UNION
  SELECT COUNT(*) AS total FROM customer
) t;
