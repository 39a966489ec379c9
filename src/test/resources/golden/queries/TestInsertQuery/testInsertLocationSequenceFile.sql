-- reference: insert_statement LOCATION branch with a reader format —
-- INSERT INTO LOCATION USING sequencefile writes container files an
-- external table mounts back
INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/loc_seq' USING sequencefile WITH ('text.delimiter'='|') SELECT r_regionkey, r_name FROM region;
DROP TABLE IF EXISTS loc_seq_read;
CREATE EXTERNAL TABLE loc_seq_read (rkey INT4, rname TEXT) USING sequencefile WITH ('text.delimiter'='|') LOCATION '/tmp/graft_golden/loc_seq';
SELECT rkey, rname FROM loc_seq_read ORDER BY rkey;
