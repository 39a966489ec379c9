-- reference: TestInsertQuery insert-into-storage-format semantics
-- (InsertRowsExec writes through the registered tablespace serializer —
-- here the rcfile writer; two appends then a padded column-list insert)
DROP TABLE IF EXISTS rc_insert_t;
CREATE TABLE rc_insert_t (id INT4, name TEXT) USING rcfile;
INSERT INTO rc_insert_t VALUES (1, 'ann'), (2, 'bob');
INSERT INTO rc_insert_t SELECT 3, 'cho';
INSERT INTO rc_insert_t (id) VALUES (4);
SELECT id, name FROM rc_insert_t ORDER BY id;
