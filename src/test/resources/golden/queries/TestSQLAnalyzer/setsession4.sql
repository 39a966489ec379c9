-- reference: TestSQLAnalyzer/setsession4.sql
SET SESSION EXTSORT_BUFFER_SIZE TO 50.7;
SELECT name, value FROM information_schema.session WHERE name = 'EXTSORT_BUFFER_SIZE';
