-- reference: TestSQLAnalyzer/positive/asterisk_4.sql — the star rides
-- between ordinary select expressions
DROP TABLE IF EXISTS people;
CREATE TABLE people (id INT4, name TEXT, age INT4, gender TEXT);
INSERT INTO people VALUES (1, 'ann', 30, 'f'), (2, 'bob', 41, 'm');
select age-10, *, length(name) from people order by id;
