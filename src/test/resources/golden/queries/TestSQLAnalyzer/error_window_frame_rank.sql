-- reference: TestSQLAnalyzer/window7.sql frame-on-row_number shape — the
-- reference's analyzer accepts (and ignores) an explicit frame on the rank
-- family; Spark enforces the family's fixed frame and rejects it. Pinned
-- as the stable error condition.
DROP TABLE IF EXISTS sum_example;
CREATE TABLE sum_example (dt FLOAT8, dt2 TEXT, xy INT8);
INSERT INTO sum_example VALUES (1.2, 'u', 10);
SELECT row_number() OVER (ORDER BY dt ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM sum_example;
