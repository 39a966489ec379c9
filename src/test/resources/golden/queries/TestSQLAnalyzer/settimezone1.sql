-- reference: TestSQLAnalyzer/settimezone1.sql — PDT is not a real zone id
-- (Java/Spark accept region ids and the fixed short ids; PDT is neither),
-- so the session clock rejects it loudly rather than mis-timing data
SET TIME ZONE 'PDT';
