DROP TABLE IF EXISTS sel_part_lim;
CREATE TABLE sel_part_lim (nkey INT4) PARTITION BY COLUMN (rk TEXT);
INSERT INTO sel_part_lim SELECT n_nationkey, CAST(n_regionkey AS TEXT) FROM nation;
SELECT nkey, rk FROM sel_part_lim ORDER BY nkey LIMIT 7;
