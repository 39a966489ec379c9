-- reference: TestSQLAnalyzer/positive/asterisk_3.sql
DROP TABLE IF EXISTS people;
DROP TABLE IF EXISTS students;
CREATE TABLE people (id INT4, name TEXT, age INT4, gender TEXT);
CREATE TABLE students (sid INT4, sname TEXT, addr TEXT, score INT4);
INSERT INTO people VALUES (1, 'ann', 30, 'f'), (2, 'bob', 41, 'm');
INSERT INTO students VALUES (10, 'sue', 'seoul', 90);
select * from people cross join students order by id;
