-- reference: TestSQLAnalyzer/positive/groupby_4.sql — expression key
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (name TEXT);
INSERT INTO table1 VALUES ('  ann '), ('ann'), (' bob'), ('cho ');
select trim(name), count(1) from table1 group by trim(name) order by trim(name);
