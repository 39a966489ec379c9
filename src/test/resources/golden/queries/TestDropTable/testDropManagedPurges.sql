DROP TABLE IF EXISTS drop_t1;
CREATE TABLE drop_t1 AS SELECT n_nationkey AS k FROM nation;
DROP TABLE drop_t1 PURGE;
CREATE TABLE drop_t1 (k INT4);
SELECT count(*) AS cnt FROM drop_t1;
