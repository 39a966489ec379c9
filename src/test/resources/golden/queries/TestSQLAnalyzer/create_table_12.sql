-- reference: TestSQLAnalyzer/positive/create_table_12.sql — external text
-- table with an explicit delimiter (location adapted)
DROP TABLE IF EXISTS table1;
DROP TABLE IF EXISTS seed12;
CREATE TABLE seed12 (name TEXT, age INT4);
INSERT INTO seed12 VALUES ('ann', 30), ('bob', 41);
INSERT OVERWRITE INTO LOCATION '/tmp/graft_sqa_t12' USING TEXT WITH ('text.delimiter'='|') SELECT name, age FROM seed12;
create external table table1 (name text, age int)
USING text WITH ('text.delimiter'='|')
location '/tmp/graft_sqa_t12';
SELECT name, age FROM table1 ORDER BY name;
