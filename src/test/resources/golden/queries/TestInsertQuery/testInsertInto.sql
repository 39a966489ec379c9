DROP TABLE IF EXISTS ins_t1;
CREATE TABLE ins_t1 (rkey INT4, rname TEXT);
INSERT INTO ins_t1 SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 3;
INSERT INTO ins_t1 SELECT r_regionkey, r_name FROM region WHERE r_regionkey >= 3;
SELECT rkey, rname FROM ins_t1 ORDER BY rkey;
