-- reference: TestSQLAnalyzer/setsession2.sql
SET SESSION ENABLE_SEQSCAN TO false;
SELECT name, value FROM information_schema.session WHERE name = 'ENABLE_SEQSCAN';
