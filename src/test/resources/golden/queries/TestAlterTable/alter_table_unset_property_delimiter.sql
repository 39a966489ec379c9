-- reference: TestAlterTable/alter_table_unset_property_delimiter.sql
DROP TABLE IF EXISTS alty;
CREATE TABLE ALTY (id int, name text);
ALTER TABLE ALTY SET PROPERTY 'text.delimiter'='|';
ALTER TABLE ALTY UNSET PROPERTY 'text.delimiter';
SHOW TBLPROPERTIES alty;
