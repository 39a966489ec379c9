-- reference: TestSQLAnalyzer/positive/set_3.sql — chained INTERSECT and
-- INTERSECT ALL
DROP TABLE IF EXISTS table1;
DROP TABLE IF EXISTS table2;
DROP TABLE IF EXISTS table3;
CREATE TABLE table1 (a INT4, b TEXT, c FLOAT8);
CREATE TABLE table2 (a INT4, b TEXT, c FLOAT8);
CREATE TABLE table3 (a INT4, b TEXT, c FLOAT8);
INSERT INTO table1 VALUES (1, 'x', 0.5), (2, 'y', 1.5), (3, 'z', 2.5);
INSERT INTO table2 VALUES (1, 'x', 0.5), (3, 'z', 2.5);
INSERT INTO table3 VALUES (3, 'z', 2.5), (1, 'x', 0.5);
select a,b,c from table1 intersect select a,b,c from table2 intersect all select a,b,c from table3 order by a;
