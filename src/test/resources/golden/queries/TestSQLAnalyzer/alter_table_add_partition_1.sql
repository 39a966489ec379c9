-- reference: TestSQLAnalyzer/alter_table_add_partition_1.sql
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (id INT4) PARTITION BY COLUMN (col1 INT4, col2 INT4);
ALTER TABLE table1 ADD PARTITION (col1 = 1 , col2 = 2);
SHOW PARTITIONS table1;
