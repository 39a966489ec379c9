-- reference: TestSQLAnalyzer/alter_table_set_property_1.sql
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (id INT4);
ALTER TABLE table1 SET PROPERTY 'timezone' = 'GMT-7';
SHOW TBLPROPERTIES table1 ('timezone');
