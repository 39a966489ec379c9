SELECT status, cnt FROM (
  SELECT o_orderstatus AS status, COUNT(*) AS cnt FROM orders GROUP BY o_orderstatus
) t WHERE cnt > 400 ORDER BY status;
