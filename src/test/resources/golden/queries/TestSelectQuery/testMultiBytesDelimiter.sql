INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/mb_delim' USING TEXT WITH ('text.delimiter'='||') SELECT r_regionkey, r_name FROM region;
DROP TABLE IF EXISTS mb_delim_read;
CREATE EXTERNAL TABLE mb_delim_read (rkey INT4, rname TEXT) USING TEXT WITH ('text.delimiter'='||') LOCATION '/tmp/graft_golden/mb_delim';
SELECT rkey, rname FROM mb_delim_read ORDER BY rkey;
