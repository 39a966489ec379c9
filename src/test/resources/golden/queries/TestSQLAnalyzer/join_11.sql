-- reference: TestSQLAnalyzer/positive/join_11.sql — the bare predicates
-- `something` / `somethingelse` are BOOLEAN columns of the fixtures
DROP TABLE IF EXISTS x;
DROP TABLE IF EXISTS y;
DROP TABLE IF EXISTS a;
DROP TABLE IF EXISTS b;
DROP TABLE IF EXISTS c;
CREATE TABLE x (x1 INT4, somethingelse BOOL);
CREATE TABLE y (y1 INT4);
CREATE TABLE a (a1 INT4, something BOOL);
CREATE TABLE b (b1 INT4);
CREATE TABLE c (c1 INT4);
INSERT INTO x VALUES (1, true), (2, false);
INSERT INTO y VALUES (10);
INSERT INTO a VALUES (100, true);
INSERT INTO b VALUES (200);
INSERT INTO c VALUES (300);
select * from x, y, (select * from a, b, c WHERE something) as ss where somethingelse;
