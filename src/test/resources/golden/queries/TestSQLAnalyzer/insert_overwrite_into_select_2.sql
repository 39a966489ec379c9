-- reference: TestSQLAnalyzer/positive/insert_overwrite_into_select_2.sql
DROP TABLE IF EXISTS table2;
DROP TABLE IF EXISTS t_loc2;
CREATE TABLE table2 (col1 INT4, col2 TEXT, col3 INT8);
INSERT INTO table2 VALUES (1, 'a', 10), (1, 'a', 20), (2, 'b', 5);
insert overwrite into location 'file:/tmp/graft_sqa_loc2' select col1, col2, sum(col3) from table2 group by col1, col2;
CREATE EXTERNAL TABLE t_loc2 (col1 INT4, col2 TEXT, col3 INT8) USING TEXT LOCATION 'file:/tmp/graft_sqa_loc2';
SELECT col1, col2, col3 FROM t_loc2 ORDER BY col1, col2;
