-- reference: TestSQLAnalyzer/settimezone2.sql — PG-style bare numeric
-- offset means a fixed UTC offset
SET TIME ZONE -7;
SELECT name, value FROM information_schema.session WHERE name = 'TIMEZONE';
