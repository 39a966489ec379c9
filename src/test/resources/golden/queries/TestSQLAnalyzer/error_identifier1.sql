-- reference: TestSQLAnalyzer/errors/identifier1.sql — a bare `1` where an
-- alias belongs is a syntax error
SELECT x,y,z FROM (
  SELECT
    l,
    K
  FROM
    TTT
  1 ) XX;
