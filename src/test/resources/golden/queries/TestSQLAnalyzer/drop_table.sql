-- reference: TestSQLAnalyzer/positive/drop_table.sql
DROP TABLE IF EXISTS abc;
CREATE TABLE abc (id INT4);
drop table abc;
