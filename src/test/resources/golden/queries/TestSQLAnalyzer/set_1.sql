-- reference: TestSQLAnalyzer/positive/set_1.sql — the third branch yields
-- two columns against three; the reference only parses this, execution
-- rejects the arity mismatch loudly
DROP TABLE IF EXISTS table1;
DROP TABLE IF EXISTS table2;
DROP TABLE IF EXISTS table3;
CREATE TABLE table1 (c1 INT4, c2 TEXT, c3 FLOAT8);
CREATE TABLE table2 (c4 INT4, c5 TEXT, c6 FLOAT8);
CREATE TABLE table3 (c7 INT4, c8 TEXT);
select c1,c2,c3 from table1 union select c4,c5,c6 from table2 union all select c7, c8 from table3;
