-- reference: TestAlterTable/table2_ddl.sql — the '+'-delimited external
-- text fixture (xx, yy, zz) the SET PROPERTY tests read through
INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/alter_table2' USING TEXT WITH ('text.delimiter'='+') SELECT 'p', 'q', 'r' UNION ALL SELECT 's', 't', 'u';
DROP TABLE IF EXISTS alter_table2;
CREATE EXTERNAL TABLE alter_table2 (xx text, yy text, zz text) USING TEXT WITH ('text.delimiter'='+') LOCATION '/tmp/graft_golden/alter_table2';
SELECT xx, yy, zz FROM alter_table2 ORDER BY xx;
