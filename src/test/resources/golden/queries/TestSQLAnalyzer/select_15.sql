-- reference: TestSQLAnalyzer/positive/select_15.sql — :: casts with Tajo
-- type keywords in the select list
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (id INT4, point FLOAT8, score TEXT);
INSERT INTO table1 VALUES (1, 3.5, '77'), (2, 4.25, '88');
select id,  point::text as point, score::INT4 as score from table1 order by id;
