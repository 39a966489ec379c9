-- reference: TestSQLAnalyzer/create_table_like_1.sql (same text as
-- positive/create_table_like_1.sql) — LIKE copies the schema, not the data
DROP TABLE IF EXISTS new_table;
DROP TABLE IF EXISTS orig_name;
CREATE TABLE orig_name (id INT4, name TEXT, score FLOAT8);
INSERT INTO orig_name VALUES (1, 'a', 1.5);
create table new_table like orig_name;
SELECT COUNT(*) AS cnt FROM new_table;
