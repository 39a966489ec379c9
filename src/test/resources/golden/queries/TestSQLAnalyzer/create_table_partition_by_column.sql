-- reference: TestSQLAnalyzer/create_table_partition_by_column.sql
DROP TABLE IF EXISTS sales;
CREATE TABLE sales ( col1 int, col2 int)
PARTITION BY COLUMN (col3 int, col4 float, col5 text);
DESCRIBE sales;
