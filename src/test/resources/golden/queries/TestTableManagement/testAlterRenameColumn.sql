DROP TABLE IF EXISTS tm_rencol;
CREATE TABLE tm_rencol AS SELECT r_regionkey, r_name FROM region;
ALTER TABLE tm_rencol RENAME COLUMN r_name TO region_name;
SELECT r_regionkey, region_name FROM tm_rencol ORDER BY r_regionkey;
