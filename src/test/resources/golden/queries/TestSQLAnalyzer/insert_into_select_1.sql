-- reference: TestSQLAnalyzer/positive/insert_into_select_1.sql
DROP TABLE IF EXISTS table1;
DROP TABLE IF EXISTS table2;
CREATE TABLE table2 (col1 INT4, col2 TEXT, col3 INT8);
INSERT INTO table2 VALUES (1, 'a', 10), (1, 'a', 20), (2, 'b', 5);
CREATE TABLE table1 (col1 INT4, col2 TEXT, col3 INT8);
insert into table1 select col1, col2, sum(col3) from table2 group by col1, col2;
SELECT col1, col2, col3 FROM table1 ORDER BY col1, col2;
