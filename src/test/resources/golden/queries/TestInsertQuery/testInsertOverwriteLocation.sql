INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/ins_loc' USING TEXT WITH ('text.delimiter'='|') SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5;
DROP TABLE IF EXISTS ins_loc_read;
CREATE EXTERNAL TABLE ins_loc_read (nkey INT4, nname TEXT) USING TEXT WITH ('text.delimiter'='|') LOCATION '/tmp/graft_golden/ins_loc';
SELECT nkey, nname FROM ins_loc_read ORDER BY nkey;
