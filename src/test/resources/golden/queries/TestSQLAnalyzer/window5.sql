-- reference: TestSQLAnalyzer/window5.sql — expression partition keys plus
-- an expression ORDER BY with ASC NULLS LAST
DROP TABLE IF EXISTS sum_example;
CREATE TABLE sum_example (dt FLOAT8, dt2 TEXT, xy INT8);
INSERT INTO sum_example VALUES
  (1.2, 'u', 10), (1.2, 'v', 20), (1.7, 'u', 30),
  (2.1, 'v', 40), (2.1, 'u', 50), (null, 'w', 60);
SELECT dt, dt2, sum(xy) OVER (PARTITION BY round(dt), dt2 ORDER BY ceil(dt) ASC NULLS LAST) AS running
FROM sum_example ORDER BY dt NULLS LAST, dt2, xy;
