DROP TABLE IF EXISTS ins_part_dyn;
CREATE TABLE ins_part_dyn (nkey INT4) PARTITION BY COLUMN (rk TEXT);
INSERT INTO ins_part_dyn SELECT n_nationkey, CAST(n_regionkey AS TEXT) FROM nation;
INSERT OVERWRITE INTO ins_part_dyn SELECT n_nationkey + 100, CAST(n_regionkey AS TEXT) FROM nation WHERE n_regionkey = 2;
SELECT rk, COUNT(*) AS cnt, MIN(nkey) AS min_key FROM ins_part_dyn GROUP BY rk ORDER BY rk;
