-- reference: TestSQLAnalyzer/setsession7.sql
SET SESSION EXTSORT_BUFFER_SIZE = 'ABCD';
SELECT name, value FROM information_schema.session WHERE name = 'EXTSORT_BUFFER_SIZE';
