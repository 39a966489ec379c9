-- reference: TestCreateTable/table1_ddl.sql — the harness's generic
-- external text fixture (id, str, num) with the default '|' delimiter
INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/ct_table1' USING TEXT WITH ('text.delimiter'='|') SELECT 1, 'aa', 10 UNION ALL SELECT 2, 'bb', 20;
DROP TABLE IF EXISTS ct_table1;
CREATE EXTERNAL TABLE ct_table1 (id int, str text, num int) using text WITH ('text.delimiter'='|') location '/tmp/graft_golden/ct_table1';
SELECT id, str, num FROM ct_table1 ORDER BY id;
