-- reference: TestSQLAnalyzer/window9.sql — a named WINDOW clause reused by
-- two rank functions (the reference also attaches a ROWS frame; Spark's
-- rank family carries its fixed frame — see window7/error_window_frame_rank)
DROP TABLE IF EXISTS sum_example;
CREATE TABLE sum_example (dt FLOAT8, dt2 TEXT, xy INT8);
INSERT INTO sum_example VALUES
  (1.2, 'u', 10), (1.2, 'v', 20), (1.7, 'u', 30),
  (2.1, 'v', 40), (2.1, 'u', 50), (null, 'w', 60);
SELECT dt, dt2, row_number() OVER window1 AS rn, rank() OVER window1 AS rk
FROM sum_example
WINDOW window1 AS (PARTITION BY round(dt), dt2 ORDER BY ceil(dt) ASC NULLS LAST)
ORDER BY dt NULLS LAST, dt2, xy;
