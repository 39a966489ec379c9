INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/multifile' USING TEXT WITH ('text.delimiter'='|') SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 3;
DROP TABLE IF EXISTS multifile_read;
CREATE EXTERNAL TABLE multifile_read (rkey INT4, rname TEXT) USING TEXT WITH ('text.delimiter'='|') LOCATION '/tmp/graft_golden/multifile';
INSERT INTO multifile_read SELECT r_regionkey, r_name FROM region WHERE r_regionkey >= 3;
SELECT rkey, rname FROM multifile_read ORDER BY rkey;
