-- reference: TestSQLAnalyzer/alter_table_add_partition_5.sql — IF NOT
-- EXISTS makes the duplicate registration a no-op
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (id INT4) PARTITION BY COLUMN (col1 TEXT);
ALTER TABLE table1 ADD PARTITION (col1 = 'TAJO' );
ALTER TABLE table1 ADD IF NOT EXISTS PARTITION (col1 = 'TAJO' );
SHOW PARTITIONS table1;
