DROP TABLE IF EXISTS ctas_empty;
CREATE TABLE ctas_empty AS SELECT n_nationkey, n_name FROM nation LIMIT 0;
SELECT COUNT(*) AS cnt FROM ctas_empty;
