INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/drop_ext' USING TEXT WITH ('text.delimiter'='|') SELECT r_regionkey, r_name FROM region;
DROP TABLE IF EXISTS drop_ext_read;
CREATE EXTERNAL TABLE drop_ext_read (rk INT4, rname TEXT) USING TEXT WITH ('text.delimiter'='|') LOCATION '/tmp/graft_golden/drop_ext';
DROP TABLE drop_ext_read;
CREATE EXTERNAL TABLE drop_ext_read (rk INT4, rname TEXT) USING TEXT WITH ('text.delimiter'='|') LOCATION '/tmp/graft_golden/drop_ext';
SELECT rk, rname FROM drop_ext_read ORDER BY rk;
