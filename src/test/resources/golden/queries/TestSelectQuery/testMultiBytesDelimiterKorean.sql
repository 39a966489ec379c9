INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/mb_delim_kr' USING TEXT WITH ('text.delimiter'='ㅎ') SELECT r_regionkey, r_name FROM region;
DROP TABLE IF EXISTS mb_delim_kr_read;
CREATE EXTERNAL TABLE mb_delim_kr_read (rkey INT4, rname TEXT) USING TEXT WITH ('text.delimiter'='ㅎ') LOCATION '/tmp/graft_golden/mb_delim_kr';
SELECT rkey, rname FROM mb_delim_kr_read ORDER BY rkey;
