-- reference: TestSQLAnalyzer/positive/create_table_11.sql — CREATE
-- EXTERNAL TABLE ... USING rcfile LOCATION (fixture written first through
-- the managed rcfile CTAS; its warehouse directory is the location)
DROP TABLE IF EXISTS rc11_src;
DROP TABLE IF EXISTS table11;
CREATE TABLE rc11_src USING rcfile AS SELECT n_name AS name, n_nationkey AS age FROM nation WHERE n_nationkey < 3;
create external table table11 (name text, age int) using rcfile location 'spark-warehouse/rc11_src';
SELECT name, age FROM table11 ORDER BY age;
