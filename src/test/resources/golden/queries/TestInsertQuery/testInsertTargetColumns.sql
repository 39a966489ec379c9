DROP TABLE IF EXISTS ins_t3;
CREATE TABLE ins_t3 (a INT4, b TEXT, c FLOAT8);
INSERT INTO ins_t3 (a, c) SELECT r_regionkey, CAST(r_regionkey AS FLOAT8) * 1.5 FROM region;
SELECT a, b, c FROM ins_t3 ORDER BY a;
