-- reference: TestAlterTable/alter_table_add_new_column_ddl.sql
DROP TABLE IF EXISTS efg;
CREATE TABLE EFG (id int, name text);
INSERT INTO efg VALUES (1, 'ann');
ALTER TABLE EFG ADD COLUMN cool text;
DESCRIBE efg;
