-- reference: TestSQLAnalyzer/positive/groupby_1.sql — partial grouping
-- analytics: a plain key mixed with CUBE and ROLLUP, HAVING on the alias
DROP TABLE IF EXISTS base;
CREATE TABLE base (col0 TEXT, col1 TEXT, col2 TEXT, col3 TEXT, col4 INT8, col5 FLOAT8);
INSERT INTO base VALUES
  ('a', 'x', 'p', 'r', 60, 1.0), ('a', 'x', 'q', 'r', 70, 2.0),
  ('a', 'y', 'p', 's', 10, 3.0), ('b', 'y', 'q', 's', 200, 4.0);
select col0, col1, col2, col3, sum(col4) as total, avg(col5) from base group by col0, cube (col1, col2), rollup(col3) having total > 100 order by col0, col1, col2, col3;
