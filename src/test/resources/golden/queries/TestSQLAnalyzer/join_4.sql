-- reference: TestSQLAnalyzer/positive/join_4.sql — bare JOIN = INNER
DROP TABLE IF EXISTS people;
DROP TABLE IF EXISTS student;
CREATE TABLE people (id INT4, name TEXT, age INT4);
CREATE TABLE student (id INT4, name TEXT, addr TEXT);
INSERT INTO people VALUES (1, 'ann', 30), (2, 'bob', 41);
INSERT INTO student VALUES (1, 'ann', 'seoul'), (3, 'cho', 'busan');
select name, addr from people join student using (id, name) order by id;
