DROP TABLE IF EXISTS trunc_re;
CREATE TABLE trunc_re (k INT4, nm TEXT);
INSERT INTO trunc_re SELECT n_nationkey, n_name FROM nation;
TRUNCATE TABLE trunc_re;
INSERT INTO trunc_re SELECT r_regionkey, r_name FROM region;
SELECT k, nm FROM trunc_re ORDER BY k;
