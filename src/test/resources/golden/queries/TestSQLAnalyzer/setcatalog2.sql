-- reference: TestSQLAnalyzer/setcatalog2.sql — a quoted mixed-letter
-- catalog name; no such database exists, so the switch fails loudly
SET CATALOG "Mixed Letter";
