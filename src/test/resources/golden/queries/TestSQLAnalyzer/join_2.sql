-- reference: TestSQLAnalyzer/positive/join_2.sql
DROP TABLE IF EXISTS people;
DROP TABLE IF EXISTS student;
CREATE TABLE people (name TEXT, age INT4);
CREATE TABLE student (name TEXT, addr TEXT);
INSERT INTO people VALUES ('ann', 30), ('bob', 41);
INSERT INTO student VALUES ('ann', 'seoul'), ('cho', 'busan');
select people.name, addr from people inner join student on people.name = student.name order by people.name;
