-- reference: TestSQLAnalyzer/window8.sql — bounded ROWS BETWEEN 1
-- PRECEDING AND CURRENT ROW frame (frame moved onto sum; see window7 note)
DROP TABLE IF EXISTS sum_example;
CREATE TABLE sum_example (dt FLOAT8, dt2 TEXT, xy INT8);
INSERT INTO sum_example VALUES
  (1.2, 'u', 10), (1.2, 'v', 20), (1.7, 'u', 30),
  (2.1, 'v', 40), (2.1, 'u', 50), (null, 'w', 60);
SELECT dt, dt2, sum(xy) OVER (PARTITION BY round(dt), dt2 ORDER BY ceil(dt) ASC NULLS LAST ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS win_sum
FROM sum_example ORDER BY dt NULLS LAST, dt2, xy;
