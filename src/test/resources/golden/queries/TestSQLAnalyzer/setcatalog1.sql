-- reference: TestSQLAnalyzer/setcatalog1.sql — Tajo "catalog" = database
CREATE DATABASE IF NOT EXISTS tajo;
SET CATALOG tajo;
SELECT name, value FROM information_schema.session WHERE name = 'CURRENT_DATABASE';
