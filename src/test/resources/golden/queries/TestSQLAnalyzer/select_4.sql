-- reference: TestSQLAnalyzer/positive/select_4.sql
DROP TABLE IF EXISTS people;
CREATE TABLE people (name TEXT, addr TEXT, age INT4);
INSERT INTO people VALUES ('ann', 'seoul', 30), ('bob', 'busan', 41), ('cho', 'daegu', 25);
select name, addr, age from people where age > 30 order by name;
