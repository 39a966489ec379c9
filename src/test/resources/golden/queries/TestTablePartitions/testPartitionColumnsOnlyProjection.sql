DROP TABLE IF EXISTS part_three;
CREATE TABLE part_three (col4 TEXT) PARTITION BY COLUMN(col1 INT4, col2 INT4, col3 FLOAT8);
INSERT OVERWRITE INTO part_three SELECT l_returnflag, l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_orderkey <= 40;
SELECT col1, col2, col3 FROM part_three ORDER BY col1, col2, col3;
