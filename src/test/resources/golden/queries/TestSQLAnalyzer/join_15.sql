-- reference: TestSQLAnalyzer/positive/join_15.sql — a named join subquery
-- joined onto outer tables
DROP TABLE IF EXISTS x;
DROP TABLE IF EXISTS y;
DROP TABLE IF EXISTS a;
DROP TABLE IF EXISTS b;
DROP TABLE IF EXISTS c;
CREATE TABLE x (id INT4, xv TEXT);
CREATE TABLE y (id INT4, yv TEXT);
CREATE TABLE a (id INT4, age INT4, sex TEXT);
CREATE TABLE b (age INT4, bv TEXT);
CREATE TABLE c (sex TEXT, cv TEXT);
INSERT INTO x VALUES (1, 'x1'), (2, 'x2');
INSERT INTO y VALUES (1, 'y1'), (3, 'y3');
INSERT INTO a VALUES (1, 30, 'f'), (2, 41, 'm');
INSERT INTO b VALUES (30, 'b30'), (50, 'b50');
INSERT INTO c VALUES ('f', 'cf'), ('x', 'cx');
select  * from x join y on x.id = y.id join (select * from a join b  on a.age = b.age join c on a.sex = c.sex) as ss on x.id = ss.id;
