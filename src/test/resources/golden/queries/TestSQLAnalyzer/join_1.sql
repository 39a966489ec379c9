-- reference: TestSQLAnalyzer/positive/join_1.sql — chained NATURAL JOIN
-- over three relations sharing a key column
DROP TABLE IF EXISTS people;
DROP TABLE IF EXISTS student;
DROP TABLE IF EXISTS professor;
CREATE TABLE people (pid INT4, name TEXT, addr TEXT);
CREATE TABLE student (pid INT4, major TEXT);
CREATE TABLE professor (pid INT4, dept TEXT);
INSERT INTO people VALUES (1, 'ann', 'seoul'), (2, 'bob', 'busan'), (3, 'cho', 'daegu');
INSERT INTO student VALUES (1, 'cs'), (3, 'math');
INSERT INTO professor VALUES (3, 'stats'), (4, 'bio');
SELECT name, addr FROM people NATURAL JOIN student NATURAL JOIN professor ORDER BY name;
