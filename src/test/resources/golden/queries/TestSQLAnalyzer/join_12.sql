-- reference: TestSQLAnalyzer/positive/join_12.sql — join conditions over
-- unqualified single columns from either side
DROP TABLE IF EXISTS people;
DROP TABLE IF EXISTS student;
DROP TABLE IF EXISTS professor;
CREATE TABLE people (name TEXT, x INT4, l INT4);
CREATE TABLE student (addr TEXT, y INT4);
CREATE TABLE professor (m INT4);
INSERT INTO people VALUES ('ann', 1, 7), ('bob', 2, 8);
INSERT INTO student VALUES ('seoul', 1), ('busan', 3);
INSERT INTO professor VALUES (7), (9);
select name, addr from people join student on x = y join professor on l = m;
