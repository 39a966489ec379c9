-- reference: TestSQLAnalyzer/positive/create_table_9.sql — float(p)
-- resolves by precision (p<=24 single, else double); bare float passes
DROP TABLE IF EXISTS widetable9;
create table widetable9 (col1 float(10), col2 float) as select 1.5, 2.5;
DESCRIBE widetable9;
