-- reference: TestSQLAnalyzer/alter_table_drop_partition_4.sql — IF EXISTS
-- tolerates a missing partition
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (id INT4) PARTITION BY COLUMN (col1 TEXT);
ALTER TABLE table1 DROP IF EXISTS PARTITION (col1 = 'TAJO' ) PURGE;
SHOW PARTITIONS table1;
