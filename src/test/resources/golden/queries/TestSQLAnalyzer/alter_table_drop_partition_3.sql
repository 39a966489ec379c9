-- reference: TestSQLAnalyzer/alter_table_drop_partition_3.sql — PURGE
-- removes the partition directory too
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (id INT4) PARTITION BY COLUMN (col1 TEXT);
ALTER TABLE table1 ADD PARTITION (col1 = 'TAJO' );
ALTER TABLE table1 DROP PARTITION (col1 = 'TAJO' ) PURGE;
SHOW PARTITIONS table1;
