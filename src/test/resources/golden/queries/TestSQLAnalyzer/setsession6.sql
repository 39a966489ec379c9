-- reference: TestSQLAnalyzer/setsession6.sql — the TO/= separator is
-- optional in the reference grammar
SET SESSION EXTSORT_BUFFER_SIZE 'ABCD';
SELECT name, value FROM information_schema.session WHERE name = 'EXTSORT_BUFFER_SIZE';
