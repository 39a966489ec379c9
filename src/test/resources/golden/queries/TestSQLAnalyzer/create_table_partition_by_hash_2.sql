-- reference: TestSQLAnalyzer/create_table_partition_by_hash_2.sql
DROP TABLE IF EXISTS sales;
CREATE TABLE sales ( col1 int, col2 int)
PARTITION BY HASH (col1)
(
  PARTITION part1,
  PARTITION part2,
  PARTITION part3
);
