INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/json_tz_sess2' USING JSON SELECT 1 AS id, '2024-01-01 00:00:00' AS t;
DROP TABLE IF EXISTS golden_json_tz_sess2;
CREATE EXTERNAL TABLE golden_json_tz_sess2 (id INT4, t TIMESTAMP) USING JSON WITH ('timezone'='GMT+9') LOCATION '/tmp/graft_golden/json_tz_sess2';
SET SESSION TIMEZONE = 'GMT+9';
DROP TABLE IF EXISTS json_tz_sess2_snap;
CREATE TABLE json_tz_sess2_snap AS SELECT id, t::text AS t_str FROM golden_json_tz_sess2;
SET TIME ZONE 'UTC';
SELECT id, t_str FROM json_tz_sess2_snap ORDER BY id;
