-- reference: TestSQLAnalyzer/positive/create_table_6.sql — CTAS into the
-- rcfile reader-backed format
DROP TABLE IF EXISTS name;
DROP TABLE IF EXISTS test;
CREATE TABLE test (name TEXT, age INT4);
INSERT INTO test VALUES ('ann', 30), ('bob', 41);
create table name (name text, age int) using rcfile as select * from test;
SELECT name, age FROM name ORDER BY name;
