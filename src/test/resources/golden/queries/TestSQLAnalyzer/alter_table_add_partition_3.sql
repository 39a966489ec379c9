-- reference: TestSQLAnalyzer/alter_table_add_partition_3.sql
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (id INT4) PARTITION BY COLUMN (col1 TEXT, col2 TEXT, col3 TEXT);
ALTER TABLE table1 ADD PARTITION (col1 = '2015' , col2 = '01', col3 = '11' ) LOCATION '/tmp/graft_sqa_warehouse/table1/col1=2015/col2=01/col3=11';
SHOW PARTITIONS table1;
