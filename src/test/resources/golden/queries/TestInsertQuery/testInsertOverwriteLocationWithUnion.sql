INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/ins_loc_union' USING TEXT WITH ('text.delimiter'='|') SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 2 UNION ALL SELECT r_regionkey + 10, r_name FROM region WHERE r_regionkey >= 3;
DROP TABLE IF EXISTS ins_loc_union_read;
CREATE EXTERNAL TABLE ins_loc_union_read (k INT4, nm TEXT) USING TEXT WITH ('text.delimiter'='|') LOCATION '/tmp/graft_golden/ins_loc_union';
SELECT k, nm FROM ins_loc_union_read ORDER BY k;
