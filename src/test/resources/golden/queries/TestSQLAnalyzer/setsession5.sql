-- reference: TestSQLAnalyzer/setsession5.sql
SET SESSION EXTSORT_BUFFER_SIZE TO 'ABCD';
SELECT name, value FROM information_schema.session WHERE name = 'EXTSORT_BUFFER_SIZE';
