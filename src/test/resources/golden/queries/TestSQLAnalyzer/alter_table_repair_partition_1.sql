-- reference: TestSQLAnalyzer/alter_table_repair_partition_1.sql — REPAIR
-- re-discovers partition directories written outside the catalog (maps to
-- the same partition walk as Tajo's repair: MSCK)
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (id INT4) PARTITION BY COLUMN (col1 INT4);
INSERT INTO table1 SELECT 10, 1;
INSERT INTO table1 SELECT 20, 2;
ALTER TABLE table1 REPAIR PARTITION;
SHOW PARTITIONS table1;
