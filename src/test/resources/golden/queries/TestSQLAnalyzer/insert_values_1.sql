-- reference: TestSQLAnalyzer/insert_values_1.sql (the reference writes the
-- string value with double quotes, which this dialect reads as an
-- identifier — single-quoted here, the executable spelling)
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (col1 INT4, col2 FLOAT8, col3 TEXT, col4 DATE, col5 TIME, col6 TIMESTAMP);
INSERT INTO table1 VALUES (1, 2.3, 'str', date '1980-04-01', time '01:50:00', timestamp '1980-04-01 01:50:00');
SELECT col1, col2, col3, col4, col5, col6 FROM table1 ORDER BY col1;
