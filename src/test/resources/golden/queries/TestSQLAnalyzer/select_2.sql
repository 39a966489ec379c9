-- reference: TestSQLAnalyzer/positive/select_2.sql — comma-list join
DROP TABLE IF EXISTS people;
DROP TABLE IF EXISTS students;
CREATE TABLE people (id INT4, name TEXT, age INT4, gender TEXT);
CREATE TABLE students (sid INT4, sname TEXT);
INSERT INTO people VALUES (1, 'ann', 30, 'f');
INSERT INTO students VALUES (10, 'sue'), (11, 'tom');
select id, name, age, gender from people as p, students as s order by id;
