-- reference: TestSQLAnalyzer/window7.sql — full ROWS BETWEEN UNBOUNDED
-- PRECEDING AND UNBOUNDED FOLLOWING frame. The reference puts the frame on
-- row_number(); Spark's analyzer enforces the rank family's fixed frame
-- (pinned by error_window_frame_rank), so the full-frame shape runs on
-- last_value here.
DROP TABLE IF EXISTS sum_example;
CREATE TABLE sum_example (dt FLOAT8, dt2 TEXT, xy INT8);
INSERT INTO sum_example VALUES
  (1.2, 'u', 10), (1.2, 'v', 20), (1.7, 'u', 30),
  (2.1, 'v', 40), (2.1, 'u', 50), (null, 'w', 60);
SELECT dt, dt2, last_value(xy) OVER (PARTITION BY round(dt), dt2 ORDER BY ceil(dt) ASC NULLS LAST ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_xy
FROM sum_example ORDER BY dt NULLS LAST, dt2, xy;
