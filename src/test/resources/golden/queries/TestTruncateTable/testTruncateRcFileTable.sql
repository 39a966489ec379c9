-- reference: TruncateTableExecutor clears the table directory regardless
-- of storage format — here an rcfile reader-backed table survives a
-- TRUNCATE + re-insert cycle
DROP TABLE IF EXISTS rc_trunc_t;
CREATE TABLE rc_trunc_t (id INT4, name TEXT) USING rcfile;
INSERT INTO rc_trunc_t VALUES (1, 'a'), (2, 'b');
TRUNCATE rc_trunc_t;
INSERT INTO rc_trunc_t VALUES (3, 'c');
SELECT id, name FROM rc_trunc_t;
