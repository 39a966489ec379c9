-- reference: TestAlterTable/alter_table_unset_not_exists_property.sql —
-- unsetting a property that was never set
DROP TABLE IF EXISTS alty;
CREATE TABLE ALTY (id int, name text);
ALTER TABLE ALTY UNSET PROPERTY 'csv.delimiter';
SHOW TBLPROPERTIES alty;
