SELECT o_orderstatus, COUNT(*) AS cnt FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
