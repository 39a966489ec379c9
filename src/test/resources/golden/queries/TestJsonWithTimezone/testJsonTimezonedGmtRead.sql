INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/tz_json_gmt' USING JSON SELECT 1 AS id, '2024-06-01 12:00:00' AS t UNION ALL SELECT 2, '2024-12-31 23:30:00';
DROP TABLE IF EXISTS tz_json_gmt_read;
CREATE EXTERNAL TABLE tz_json_gmt_read (id INT4, t TIMESTAMP) USING JSON WITH ('timezone'='GMT') LOCATION '/tmp/graft_golden/tz_json_gmt';
SET TIME ZONE 'GMT';
DROP TABLE IF EXISTS tz_json_gmt_snap;
CREATE TABLE tz_json_gmt_snap AS SELECT id, t::text AS t_str FROM tz_json_gmt_read;
SET TIME ZONE 'UTC';
SELECT id, t_str FROM tz_json_gmt_snap ORDER BY id;
