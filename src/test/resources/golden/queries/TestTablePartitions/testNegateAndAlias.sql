DROP TABLE IF EXISTS part_lineitem;
CREATE TABLE part_lineitem (col1 INT4, col2 INT4, null_col INT4) PARTITION BY COLUMN(key FLOAT8);
INSERT OVERWRITE INTO part_lineitem (col1, col2, key) SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_orderkey <= 100;
SELECT col1, key, -key AS neg FROM part_lineitem ORDER BY col1, col2, key;
