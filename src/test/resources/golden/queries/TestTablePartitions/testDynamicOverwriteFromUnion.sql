DROP TABLE IF EXISTS part_union;
CREATE TABLE part_union (nkey INT4) PARTITION BY COLUMN (rk TEXT);
INSERT INTO part_union SELECT n_nationkey, CAST(n_regionkey AS TEXT) FROM nation;
INSERT OVERWRITE INTO part_union
SELECT n_nationkey + 1000, CAST(n_regionkey AS TEXT) FROM nation WHERE n_regionkey = 0
UNION ALL
SELECT n_nationkey + 2000, CAST(n_regionkey AS TEXT) FROM nation WHERE n_regionkey = 4;
SELECT rk, COUNT(*) AS cnt, MIN(nkey) AS min_key FROM part_union GROUP BY rk ORDER BY rk;
