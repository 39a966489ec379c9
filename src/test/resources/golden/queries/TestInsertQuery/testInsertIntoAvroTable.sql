-- reference: TestInsertQuery insert-into-storage-format semantics — two
-- appends into a managed avro container-file table re-read as the union
DROP TABLE IF EXISTS avro_insert_t;
CREATE TABLE avro_insert_t (k INT8, v TEXT) USING avro;
INSERT INTO avro_insert_t VALUES (10, 'a');
INSERT INTO avro_insert_t VALUES (20, 'b');
SELECT k, v FROM avro_insert_t ORDER BY k;
