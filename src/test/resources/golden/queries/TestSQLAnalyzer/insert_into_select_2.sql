-- reference: TestSQLAnalyzer/positive/insert_into_select_2.sql — insert
-- into a filesystem location (path adapted); a directory insert always
-- replaces the directory, and reads back through an external table
DROP TABLE IF EXISTS table2;
DROP TABLE IF EXISTS t_loc;
CREATE TABLE table2 (col1 INT4, col2 TEXT, col3 INT8);
INSERT INTO table2 VALUES (1, 'a', 10), (1, 'a', 20), (2, 'b', 5);
insert into location 'file:/tmp/graft_sqa_loc1' select col1, col2, sum(col3) from table2 group by col1, col2;
CREATE EXTERNAL TABLE t_loc (col1 INT4, col2 TEXT, col3 INT8) USING TEXT LOCATION 'file:/tmp/graft_sqa_loc1';
SELECT col1, col2, col3 FROM t_loc ORDER BY col1, col2;
