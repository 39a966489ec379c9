-- reference: TestSQLAnalyzer/positive/groupby_5.sql
DROP TABLE IF EXISTS people;
CREATE TABLE people (id INT4, name TEXT, age INT4);
INSERT INTO people VALUES (1, 'ann', 30), (1, 'ann', 32), (2, 'bob', 41);
select id, name, count(*), sum(id), avg(age) from people group by id, name order by id, name;
