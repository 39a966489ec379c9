-- reference: TestSQLAnalyzer/create_table_partition_by_range.sql
DROP TABLE IF EXISTS sales;
CREATE TABLE sales ( col1 int, col2 int)
PARTITION BY RANGE (col1)
 (
  PARTITION col1 VALUES LESS THAN (2),
  PARTITION col1 VALUES LESS THAN (5),
  PARTITION col1 VALUES LESS THAN (MAXVALUE)
 );
