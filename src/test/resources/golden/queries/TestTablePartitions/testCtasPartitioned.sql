DROP TABLE IF EXISTS part_ctas;
CREATE TABLE part_ctas PARTITION BY COLUMN(key FLOAT8) AS SELECT l_orderkey AS col1, l_partkey AS col2, l_quantity AS key FROM lineitem WHERE l_orderkey <= 60;
SELECT key, COUNT(*) AS cnt FROM part_ctas GROUP BY key ORDER BY key;
