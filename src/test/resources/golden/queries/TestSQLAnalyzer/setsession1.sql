-- reference: TestSQLAnalyzer/setsession1.sql
SET SESSION ENABLE_SEQSCAN TO true;
SELECT name, value FROM information_schema.session WHERE name = 'ENABLE_SEQSCAN';
