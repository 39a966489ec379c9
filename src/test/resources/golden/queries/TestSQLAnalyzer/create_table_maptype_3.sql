-- reference: TestSQLAnalyzer/create_table_maptype_3.sql — doubly nested
-- RECORD inside a map value
DROP TABLE IF EXISTS t1;
CREATE TABLE T1 (A TEXT, B INT4, C MAP<TEXT, RECORD (name RECORD (first_name TEXT, last_name TEXT), age INT4)>, F FLOAT8);
DESCRIBE t1;
