-- reference: TestSQLAnalyzer/positive/create_table_3.sql — storage
-- property on an empty managed rcfile table (the buffer size is a write
-- hint the engine ignores)
DROP TABLE IF EXISTS name;
create table name (name text, age int) using rcfile with ('rcfile.buffer'=4096);
DESCRIBE name;
