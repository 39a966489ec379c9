-- reference: TestAlterTable/table1_ddl.sql — the suite's external text
-- fixture (id, str, num), '|' delimited
INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/alter_table1' USING TEXT WITH ('text.delimiter'='|') SELECT 1, 'aa', 10 UNION ALL SELECT 2, 'bb', 20;
DROP TABLE IF EXISTS alter_table1;
CREATE EXTERNAL TABLE alter_table1 (id int, str text, num int) USING TEXT WITH ('text.delimiter'='|') LOCATION '/tmp/graft_golden/alter_table1';
SELECT id, str, num FROM alter_table1 ORDER BY id;
