-- reference: TestSQLAnalyzer/window3.sql — PARTITION BY an expression
DROP TABLE IF EXISTS sum_example;
CREATE TABLE sum_example (dt FLOAT8, dt2 TEXT, xy INT8);
INSERT INTO sum_example VALUES
  (1.2, 'u', 10), (1.2, 'v', 20), (1.7, 'u', 30),
  (2.1, 'v', 40), (2.1, 'u', 50), (null, 'w', 60);
SELECT dt, sum(xy) OVER (PARTITION BY round(dt)) AS total FROM sum_example ORDER BY dt NULLS LAST, xy;
