-- reference: TestSQLAnalyzer/positive/parentheses_table_3.sql — alias with
-- a column rename list
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (a INT4, b TEXT, c FLOAT8);
INSERT INTO table1 VALUES (1, 'a', 0.5), (2, 'b', 1.5);
select x, y, z from (table1 t1 (x,y,z)) order by x;
