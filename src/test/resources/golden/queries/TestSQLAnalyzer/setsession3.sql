-- reference: TestSQLAnalyzer/setsession3.sql
SET SESSION EXTSORT_BUFFER_SIZE TO 100;
SELECT name, value FROM information_schema.session WHERE name = 'EXTSORT_BUFFER_SIZE';
