-- reference: TestAlterTable/alter_table_rename_column_ddl.sql
DROP TABLE IF EXISTS xyz;
CREATE TABLE XYZ (id int, str text, num int);
INSERT INTO xyz VALUES (1, 'ann', 10), (2, 'bob', 20);
ALTER TABLE XYZ RENAME COLUMN num TO renum;
SELECT id, str, renum FROM xyz ORDER BY id;
