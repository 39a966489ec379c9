-- reference: TestSQLAnalyzer/create_table_nested_1.sql
DROP TABLE IF EXISTS t1;
CREATE TABLE T1 (A TEXT, B INT4, C RECORD (D TEXT, E INT8), F FLOAT8);
DESCRIBE t1;
