DROP TABLE IF EXISTS part_in;
CREATE TABLE part_in (nkey INT4) PARTITION BY COLUMN (rk TEXT);
INSERT INTO part_in SELECT n_nationkey, CAST(n_regionkey AS TEXT) FROM nation;
SELECT rk, COUNT(*) AS cnt FROM part_in WHERE rk IN ('1', '3') GROUP BY rk ORDER BY rk;
