-- reference: TestAlterTable/testAlterTableSetProperty.sql (ALTX) — the
-- data file carries both delimiters; after ALTER ... SET PROPERTY
-- 'text.delimiter' the same file re-reads split on the NEW delimiter
-- (reference results before/after_set_property_delimiter.result)
INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/altx' USING TEXT WITH ('text.delimiter'='|') SELECT 'aaa+AAA', 'bbb+BBB', 'ccc';
DROP TABLE IF EXISTS altx;
CREATE EXTERNAL TABLE altx (xx text, yy text, zz text) USING TEXT WITH ('text.delimiter'='+') LOCATION '/tmp/graft_golden/altx';
ALTER TABLE altx SET PROPERTY 'text.delimiter' = '|';
SELECT xx, yy, zz FROM altx;
