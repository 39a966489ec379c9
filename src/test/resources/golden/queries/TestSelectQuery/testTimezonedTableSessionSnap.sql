INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/tz_csv_sess' USING TEXT WITH ('text.delimiter'='|') SELECT 1 AS id, '2024-06-01 12:00:00' AS t UNION ALL SELECT 2, '2024-12-31 23:30:00';
DROP TABLE IF EXISTS tz_csv_sess_read;
CREATE EXTERNAL TABLE tz_csv_sess_read (id INT4, t TIMESTAMP) USING TEXT WITH ('text.delimiter'='|', 'timezone'='GMT+9') LOCATION '/tmp/graft_golden/tz_csv_sess';
SET TIME ZONE 'GMT+9';
DROP TABLE IF EXISTS tz_sess_snap;
CREATE TABLE tz_sess_snap AS SELECT id, t::text AS t_str FROM tz_csv_sess_read;
SET TIME ZONE 'UTC';
SELECT id, t_str FROM tz_sess_snap ORDER BY id;
