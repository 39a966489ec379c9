-- reference: TestSQLAnalyzer/alter_table_set_property_3.sql — several
-- properties in one statement
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (id INT4);
ALTER TABLE table1 SET PROPERTY 'compression.type'='RECORD','compression.codec'='org.apache.hadoop.io.compress.SnappyCodec';
SHOW TBLPROPERTIES table1 ('compression.codec');
