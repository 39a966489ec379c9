DROP TABLE IF EXISTS tz_json_load;
CREATE TABLE tz_json_load (id INT4, t TIMESTAMP) USING JSON WITH ('timezone'='GMT+9');
INSERT INTO tz_json_load SELECT 1 AS id, '2024-06-01 12:00:00'::timestamp AS t UNION ALL SELECT 2, '2024-12-31 23:30:00'::timestamp;
DROP TABLE IF EXISTS tz_json_load_snap;
CREATE TABLE tz_json_load_snap AS SELECT id, t::text AS t_str FROM tz_json_load;
SELECT id, t_str FROM tz_json_load_snap ORDER BY id;
