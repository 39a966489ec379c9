DROP TABLE IF EXISTS ctas_p1;
CREATE TABLE ctas_p1 USING PARQUET PARTITION BY COLUMN (o_orderpriority) AS SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey < 50;
SELECT o_orderpriority, COUNT(*) AS cnt FROM ctas_p1 GROUP BY o_orderpriority ORDER BY o_orderpriority;
