-- reference: TestSQLAnalyzer/errors/identifier1.sql — a stray numeric
-- token inside a derived table is a syntax error
SELECT x, y, z FROM (
  SELECT l, k FROM ttt 1
) xx;
