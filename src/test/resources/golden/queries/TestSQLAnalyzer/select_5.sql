-- reference: TestSQLAnalyzer/positive/select_5.sql (the undefined func()
-- call swapped for an executable conditional with the same argument
-- shapes: an expression, an arithmetic term, a comparison)
DROP TABLE IF EXISTS people;
CREATE TABLE people (name TEXT, score INT4, age INT4);
INSERT INTO people VALUES ('ann', 10, 30), ('bob', 20, 30);
select name as n, if(3>4, score, 3+4) as total, 3+4 as id from people where age = 30 order by n;
