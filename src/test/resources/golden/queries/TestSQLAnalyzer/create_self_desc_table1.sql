-- reference: TestSQLAnalyzer/positive/create_self_desc_table1.sql —
-- schemaless (*) external json table (location adapted; seeded first)
DROP TABLE IF EXISTS schemaless;
DROP TABLE IF EXISTS seed_sd;
CREATE TABLE seed_sd (name TEXT, num INT8);
INSERT INTO seed_sd VALUES ('ann', 1), ('bob', 2);
INSERT OVERWRITE INTO LOCATION '/tmp/graft_sqa_sd1' USING JSON SELECT name, num FROM seed_sd;
create external table schemaless (*) using json with ('compression.codec'='none') location 'file:/tmp/graft_sqa_sd1';
SELECT name, num FROM schemaless ORDER BY num;
