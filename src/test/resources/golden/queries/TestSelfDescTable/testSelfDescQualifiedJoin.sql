INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/sd_q1' USING JSON SELECT n_nationkey AS k, n_name AS nname, n_regionkey AS rk FROM nation WHERE n_nationkey < 6;
INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/sd_q2' USING JSON SELECT r_regionkey AS k, r_name AS rname FROM region;
DROP TABLE IF EXISTS sd_q1_read;
DROP TABLE IF EXISTS sd_q2_read;
CREATE EXTERNAL TABLE sd_q1_read USING JSON LOCATION '/tmp/graft_golden/sd_q1';
CREATE EXTERNAL TABLE sd_q2_read USING JSON LOCATION '/tmp/graft_golden/sd_q2';
SELECT sd_q1_read.nname, sd_q2_read.rname
FROM sd_q1_read JOIN sd_q2_read ON sd_q1_read.rk = sd_q2_read.k
ORDER BY sd_q1_read.nname;
