-- reference: TestAlterTable/alter_table_rename_table_ddl.sql — rename to a
-- quoted identifier; the old name stops resolving
DROP TABLE IF EXISTS abc;
DROP TABLE IF EXISTS "DEF";
CREATE TABLE ABC (id int, name text);
INSERT INTO abc VALUES (1, 'ann'), (2, 'bob');
ALTER TABLE ABC RENAME TO "DEF";
SELECT id, name FROM "DEF" ORDER BY id;
