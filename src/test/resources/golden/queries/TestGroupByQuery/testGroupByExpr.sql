SELECT o_orderkey % 3 AS g, COUNT(*) AS cnt FROM orders GROUP BY o_orderkey % 3 ORDER BY g;
