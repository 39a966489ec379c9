-- reference: TestSQLAnalyzer/positive/create_table_10.sql (location
-- adapted; the data is laid down first with a directory insert)
DROP TABLE IF EXISTS table1;
DROP TABLE IF EXISTS seed10;
CREATE TABLE seed10 (name TEXT, age INT4, earn INT8, score FLOAT4);
INSERT INTO seed10 VALUES ('ann', 30, 1000, 1.5), ('bob', 41, 2000, 2.5);
INSERT OVERWRITE INTO LOCATION '/tmp/graft_sqa_t10' SELECT name, age, earn, score FROM seed10;
create external table table1 (name text, age int, earn bigint, score float) using text location '/tmp/graft_sqa_t10';
SELECT name, age, earn, score FROM table1 ORDER BY name;
