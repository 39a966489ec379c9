-- reference: TestSQLAnalyzer/positive/parentheses_table_2.sql — alias on a
-- parenthesized relation
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (x INT4, y TEXT, z FLOAT8);
INSERT INTO table1 VALUES (1, 'a', 0.5), (2, 'b', 1.5);
select x, y, z from (table1 x) order by x.x;
