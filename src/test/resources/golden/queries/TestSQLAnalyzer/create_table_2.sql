-- reference: TestSQLAnalyzer/positive/create_table_2.sql — a managed
-- rcfile table is created EMPTY (the reference registers empty metadata)
DROP TABLE IF EXISTS name;
create table name (name text, age int) using rcfile;
SELECT COUNT(*) AS cnt FROM name;
