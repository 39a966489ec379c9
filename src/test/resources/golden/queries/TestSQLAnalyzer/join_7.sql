-- reference: TestSQLAnalyzer/positive/join_7.sql
DROP TABLE IF EXISTS people;
DROP TABLE IF EXISTS student;
CREATE TABLE people (name TEXT, age INT4);
CREATE TABLE student (name TEXT, addr TEXT);
INSERT INTO people VALUES ('ann', 30), ('bob', 41);
INSERT INTO student VALUES ('ann', 'seoul'), ('cho', 'busan');
select student.name, addr from people right outer join student on people.name = student.name order by student.name;
