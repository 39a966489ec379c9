-- reference: TestSQLAnalyzer/positive/join_14.sql — chained explicit cross
-- joins
DROP TABLE IF EXISTS a;
DROP TABLE IF EXISTS b;
DROP TABLE IF EXISTS c;
DROP TABLE IF EXISTS d;
DROP TABLE IF EXISTS e;
CREATE TABLE a (a1 INT4);
CREATE TABLE b (b1 INT4);
CREATE TABLE c (c1 INT4);
CREATE TABLE d (d1 INT4);
CREATE TABLE e (e1 INT4);
INSERT INTO a VALUES (1);
INSERT INTO b VALUES (2);
INSERT INTO c VALUES (3);
INSERT INTO d VALUES (4);
INSERT INTO e VALUES (5);
select * from a cross join b cross join c cross join d cross join e;
