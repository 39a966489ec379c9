-- reference: TestCreateTable/testSelfDescTable1.sql — a MANAGED
-- self-describing table has no files to infer a schema from; the engine
-- requires the external form (see TestSQLAnalyzer/create_self_desc_table2)
CREATE DATABASE IF NOT EXISTS d9;
DROP TABLE IF EXISTS d9.schemaless;
create table d9.schemaless (*) using json with ('compression.codec'='none') partition by column (id int8);
