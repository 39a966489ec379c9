-- reference: TestSQLAnalyzer/case_sensitivity1.sql — unquoted identifiers
-- fold case; the table is addressable in any case
DROP TABLE IF EXISTS default.table1;
CREATE TABLE DEFAULT.TABLE1 (XXX INTEGER);
INSERT INTO table1 VALUES (7);
SELECT xxx FROM default.TABLE1 ORDER BY xxx;
