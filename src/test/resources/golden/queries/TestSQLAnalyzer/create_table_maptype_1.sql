-- reference: TestSQLAnalyzer/create_table_maptype_1.sql
DROP TABLE IF EXISTS t1;
CREATE TABLE T1 (A TEXT, B INT4, C MAP<TEXT, INT8>, F FLOAT8);
DESCRIBE t1;
