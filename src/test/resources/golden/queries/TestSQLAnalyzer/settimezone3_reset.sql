-- suite hygiene (not a reference case): restore UTC for later suites and
-- pin the restore
SET TIME ZONE 'UTC';
SELECT name, value FROM information_schema.session WHERE name = 'TIMEZONE';
