-- reference: TestSQLAnalyzer/positive/create_partitioned_table_as_select.sql
DROP TABLE IF EXISTS sales;
DROP TABLE IF EXISTS sales_src;
CREATE TABLE sales_src (col1 INT4, col2 INT4, col3 INT4, col4 FLOAT4, col5 TEXT);
INSERT INTO sales_src VALUES (20, 1, 7, 0.5, 'seoul'), (10, 2, 8, 1.5, 'busan'), (30, 3, 9, 2.5, 'daegu');
CREATE TABLE sales (
  col1 int,
  col2 int)
PARTITION BY COLUMN (col3 int, col4 float, col5 text) AS

SELECT
  col1,
  col2,
  col3,
  col4,
  col5
FROM
  sales_src
WHERE
  col1 > 16;
SELECT col1, col2, col3, col4, col5 FROM sales ORDER BY col1;
