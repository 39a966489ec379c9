DROP TABLE IF EXISTS ins_t2;
CREATE TABLE ins_t2 (nkey INT4, nname TEXT);
INSERT INTO ins_t2 SELECT n_nationkey, n_name FROM nation;
INSERT OVERWRITE INTO ins_t2 SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5;
SELECT COUNT(*) AS cnt, MIN(nkey) AS min_key, MAX(nkey) AS max_key FROM ins_t2;
