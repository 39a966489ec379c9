INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/tz_json' USING JSON SELECT '2024-01-01 00:00:00' AS t, 1 AS id;
DROP TABLE IF EXISTS golden_tz_json;
CREATE EXTERNAL TABLE golden_tz_json (id INT4, t TIMESTAMP) USING JSON WITH ('timezone'='GMT+9') LOCATION '/tmp/graft_golden/tz_json';
SELECT id, t FROM golden_tz_json;
