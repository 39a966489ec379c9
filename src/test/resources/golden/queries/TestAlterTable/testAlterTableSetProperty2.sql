-- reference: TestAlterTable/testAlterTableSetProperty2.sql (ALTY) — SET
-- PROPERTY 'text.null' makes the null token live for subsequent reads
INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/alty' USING TEXT WITH ('text.delimiter'='+') SELECT 'a', '@NULL@', 'c';
DROP TABLE IF EXISTS alty;
CREATE EXTERNAL TABLE alty (xx text, yy text, zz text) USING TEXT WITH ('text.delimiter'='+') LOCATION '/tmp/graft_golden/alty';
ALTER TABLE alty SET PROPERTY 'text.null' = '@NULL@';
SELECT xx, yy, zz FROM alty;
