CREATE DATABASE IF NOT EXISTS insdb;
DROP TABLE IF EXISTS insdb.regcopy;
CREATE TABLE insdb.regcopy (rkey INT4, rname TEXT);
INSERT INTO insdb.regcopy SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 4;
SELECT rkey, rname FROM insdb.regcopy ORDER BY rkey;
