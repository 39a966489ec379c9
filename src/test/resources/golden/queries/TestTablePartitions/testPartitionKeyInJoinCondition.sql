DROP TABLE IF EXISTS part_joinkey;
CREATE TABLE part_joinkey (nkey INT4) PARTITION BY COLUMN (rk TEXT);
INSERT INTO part_joinkey SELECT n_nationkey, CAST(n_regionkey AS TEXT) FROM nation;
SELECT p.rk, r.r_name, COUNT(*) AS cnt
FROM part_joinkey p JOIN region r ON p.rk = CAST(r.r_regionkey AS TEXT)
GROUP BY p.rk, r.r_name
ORDER BY p.rk;
