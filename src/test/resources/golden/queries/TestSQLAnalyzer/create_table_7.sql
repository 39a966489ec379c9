-- reference: TestSQLAnalyzer/positive/create_table_7.sql — rcfile CTAS
-- with a storage property (the unquoted buffer size is a write hint the
-- engine ignores)
DROP TABLE IF EXISTS name;
DROP TABLE IF EXISTS test;
CREATE TABLE test (name TEXT, age INT4);
INSERT INTO test VALUES ('ann', 30), ('bob', 41);
create table name (name text, age int) using rcfile with ('rcfile.buffer'= 4096) as select * from test;
SELECT name, age FROM name ORDER BY name;
