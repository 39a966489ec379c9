-- reference: TestSQLAnalyzer/positive/asterisk_1.sql
DROP TABLE IF EXISTS people;
CREATE TABLE people (id INT4, name TEXT, age INT4, gender TEXT);
INSERT INTO people VALUES (1, 'ann', 30, 'f'), (2, 'bob', 41, 'm'), (3, 'cho', 25, 'f');
select * from people order by id;
