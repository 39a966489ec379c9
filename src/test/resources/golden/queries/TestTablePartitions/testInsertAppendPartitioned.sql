DROP TABLE IF EXISTS part_append;
CREATE TABLE part_append (col1 INT4, col2 INT4) PARTITION BY COLUMN(key FLOAT8);
INSERT OVERWRITE INTO part_append SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_orderkey <= 60;
INSERT INTO part_append SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_orderkey <= 60;
SELECT key, COUNT(*) AS cnt FROM part_append GROUP BY key ORDER BY key;
