-- reference: TestSQLAnalyzer/settimezone3.sql — SET TIME ZONE DEFAULT
-- restores the session's startup zone (UTC here)
SET TIME ZONE 'GMT+5';
SET TIME ZONE DEFAULT;
SELECT name, value FROM information_schema.session WHERE name = 'TIMEZONE';
