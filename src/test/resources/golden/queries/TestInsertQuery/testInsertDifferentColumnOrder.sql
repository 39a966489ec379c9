DROP TABLE IF EXISTS ins_t4;
CREATE TABLE ins_t4 (nname TEXT, nkey INT4);
INSERT INTO ins_t4 (nkey, nname) SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 4;
SELECT nname, nkey FROM ins_t4 ORDER BY nkey;
