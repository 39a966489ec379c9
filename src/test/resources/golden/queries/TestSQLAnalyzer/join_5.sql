-- reference: TestSQLAnalyzer/positive/join_5.sql
DROP TABLE IF EXISTS people;
DROP TABLE IF EXISTS student;
CREATE TABLE people (name TEXT, age INT4);
CREATE TABLE student (sname TEXT, addr TEXT);
INSERT INTO people VALUES ('ann', 30), ('bob', 41);
INSERT INTO student VALUES ('sue', 'seoul');
select name, addr from people cross join student order by name;
