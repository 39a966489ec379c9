-- reference: TestSQLAnalyzer/positive/create_self_desc_table2.sql — a
-- MANAGED schemaless table: the schema only exists once data arrives, so
-- creation without a location fails loudly (the reference parses this but
-- its executor requires self-describing tables to be external too)
DROP TABLE IF EXISTS schemaless;
create table schemaless (*) using json with ('compression.codec'='none') partition by column (id int8);
