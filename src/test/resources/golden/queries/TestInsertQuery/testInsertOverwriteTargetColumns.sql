DROP TABLE IF EXISTS ins_ovr_cols;
CREATE TABLE ins_ovr_cols (a INT4, b TEXT, c FLOAT8);
INSERT INTO ins_ovr_cols SELECT r_regionkey, r_name, 1.0 FROM region;
INSERT OVERWRITE INTO ins_ovr_cols (a, b) SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 3;
SELECT a, b, c FROM ins_ovr_cols ORDER BY a;
