-- reference: TestSQLAnalyzer/positive/in_subquery_1.sql
DROP TABLE IF EXISTS table1;
DROP TABLE IF EXISTS table2;
CREATE TABLE table1 (c1 INT4, c2 TEXT, c3 TEXT);
CREATE TABLE table2 (c4 INT4);
INSERT INTO table1 VALUES (1, 'a', 'x'), (2, 'b', 'y'), (3, 'c', 'z');
INSERT INTO table2 VALUES (1), (3);
select c1,c2,c3 from table1 where c1 in (select c4 from table2) order by c1;
