CREATE DATABASE IF NOT EXISTS insdb2;
DROP TABLE IF EXISTS insdb2.ovr;
CREATE TABLE insdb2.ovr (k INT4, nm TEXT);
INSERT INTO insdb2.ovr SELECT r_regionkey, r_name FROM region;
INSERT OVERWRITE INTO insdb2.ovr SELECT r_regionkey, r_name FROM region WHERE r_regionkey >= 3;
SELECT k, nm FROM insdb2.ovr ORDER BY k;
