-- reference: TestSQLAnalyzer/alter_table_set_property_2.sql
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (id INT4);
ALTER TABLE table1 SET PROPERTY 'text.delimiter' = '&';
SHOW TBLPROPERTIES table1 ('text.delimiter');
