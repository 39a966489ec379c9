DROP TABLE IF EXISTS golden_ins_smaller;
CREATE TABLE golden_ins_smaller (col1 INT8, col2 INT8, col3 FLOAT8);
INSERT OVERWRITE INTO golden_ins_smaller SELECT l_orderkey FROM lineitem WHERE l_orderkey < 5;
SELECT col1, col2, col3 FROM golden_ins_smaller ORDER BY col1;
