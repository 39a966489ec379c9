DROP TABLE IF EXISTS sd1_stage;
CREATE EXTERNAL TABLE sd1_stage (name RECORD (first_name TEXT, last_name TEXT)) USING JSON LOCATION '/tmp/graft_golden/sd1';
INSERT OVERWRITE INTO sd1_stage SELECT named_struct('first_name', CONCAT('FN_', CAST(n_nationkey % 4 AS STRING)), 'last_name', n_name) FROM nation;
DROP TABLE IF EXISTS self_desc_table1;
CREATE EXTERNAL TABLE self_desc_table1 USING JSON LOCATION '/tmp/graft_golden/sd1';
SELECT name.first_name, COUNT(*) FROM self_desc_table1 GROUP BY name.first_name ORDER BY name.first_name;
