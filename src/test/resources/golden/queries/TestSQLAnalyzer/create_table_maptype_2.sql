-- reference: TestSQLAnalyzer/create_table_maptype_2.sql — map value is a
-- nested RECORD
DROP TABLE IF EXISTS t1;
CREATE TABLE T1 (A TEXT, B INT4, C MAP<TEXT, RECORD (name TEXT, age INT4)>, F FLOAT8);
DESCRIBE t1;
