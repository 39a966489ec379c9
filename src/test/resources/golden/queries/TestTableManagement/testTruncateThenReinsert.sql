DROP TABLE IF EXISTS trunc_t;
CREATE TABLE trunc_t (k INT4, nm TEXT);
INSERT INTO trunc_t SELECT r_regionkey, r_name FROM region;
TRUNCATE trunc_t;
INSERT INTO trunc_t SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 2;
SELECT k, nm FROM trunc_t ORDER BY k;
