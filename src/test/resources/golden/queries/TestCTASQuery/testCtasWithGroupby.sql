DROP TABLE IF EXISTS ctas_g1;
CREATE TABLE ctas_g1 AS SELECT o_orderstatus, COUNT(*) AS cnt FROM orders GROUP BY o_orderstatus;
SELECT o_orderstatus, cnt FROM ctas_g1 ORDER BY o_orderstatus;
