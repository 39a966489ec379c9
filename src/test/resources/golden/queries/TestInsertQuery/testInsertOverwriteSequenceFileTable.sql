-- reference: TestInsertQuery overwrite-into-storage-format semantics —
-- INSERT OVERWRITE INTO a sequencefile table replaces all previous data
DROP TABLE IF EXISTS seq_overwrite_t;
CREATE TABLE seq_overwrite_t (k INT4, v TEXT) USING sequencefile WITH ('text.delimiter'='|');
INSERT INTO seq_overwrite_t VALUES (7, 'stale');
INSERT OVERWRITE INTO seq_overwrite_t VALUES (1, 'xy'), (2, 'zz');
INSERT INTO seq_overwrite_t SELECT 3, 'ww';
SELECT k, v FROM seq_overwrite_t ORDER BY k;
