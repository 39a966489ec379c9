-- reference: TestSQLAnalyzer/positive/create_table_5.sql — CTAS with a
-- declared schema coercing the select output positionally
DROP TABLE IF EXISTS name;
DROP TABLE IF EXISTS test;
CREATE TABLE test (a TEXT, b INT8);
INSERT INTO test VALUES ('ann', 30), ('bob', 41);
create table name (name text, age int) as select * from test;
SELECT name, age FROM name ORDER BY name;
