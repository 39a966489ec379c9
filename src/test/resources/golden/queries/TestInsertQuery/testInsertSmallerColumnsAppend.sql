DROP TABLE IF EXISTS golden_ins_smaller2;
CREATE TABLE golden_ins_smaller2 (col1 INT8, col2 TEXT);
INSERT INTO golden_ins_smaller2 SELECT n_nationkey FROM nation WHERE n_nationkey < 2;
INSERT INTO golden_ins_smaller2 SELECT n_nationkey, n_name FROM nation WHERE n_nationkey = 3;
SELECT col1, col2 FROM golden_ins_smaller2 ORDER BY col1;
