INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/json_tz_sess' USING JSON SELECT 1 AS id, '2024-01-01 00:00:00' AS t UNION ALL SELECT 2, '2024-07-01 09:30:00';
DROP TABLE IF EXISTS golden_json_tz_sess;
CREATE EXTERNAL TABLE golden_json_tz_sess (id INT4, t TIMESTAMP) USING JSON WITH ('timezone'='GMT+9') LOCATION '/tmp/graft_golden/json_tz_sess';
SET TIME ZONE 'GMT+9';
DROP TABLE IF EXISTS json_tz_sess_snap;
CREATE TABLE json_tz_sess_snap AS SELECT id, t::text AS t_str FROM golden_json_tz_sess;
SET TIME ZONE 'UTC';
SELECT id, t_str FROM json_tz_sess_snap ORDER BY id;
