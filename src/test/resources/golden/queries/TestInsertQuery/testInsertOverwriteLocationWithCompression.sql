INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/ins_gz' USING TEXT WITH ('text.delimiter'='|', 'compression.codec'='gzip') SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 6;
DROP TABLE IF EXISTS ins_gz_read;
CREATE EXTERNAL TABLE ins_gz_read (nkey INT4, nname TEXT) USING TEXT WITH ('text.delimiter'='|') LOCATION '/tmp/graft_golden/ins_gz';
SELECT nkey, nname FROM ins_gz_read ORDER BY nkey;
