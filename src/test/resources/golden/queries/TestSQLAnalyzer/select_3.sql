-- reference: TestSQLAnalyzer/positive/select_3.sql
DROP TABLE IF EXISTS students;
CREATE TABLE students (name TEXT, addr TEXT, score INT4);
INSERT INTO students VALUES ('sue', 'seoul', 90), ('sue', 'seoul', 80), ('tom', 'busan', 70);
select name, addr, sum(score) from students group by name, addr order by name, addr;
