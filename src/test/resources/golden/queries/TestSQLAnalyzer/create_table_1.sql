-- reference: TestSQLAnalyzer/positive/create_table_1.sql
DROP TABLE IF EXISTS name;
create table name (name text, age int);
DESCRIBE name;
