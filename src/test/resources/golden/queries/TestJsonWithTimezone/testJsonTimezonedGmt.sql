INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/json_tz_gmt' USING JSON SELECT 1 AS id, '2024-01-01 00:00:00' AS t UNION ALL SELECT 2, '2024-07-01 09:30:00';
DROP TABLE IF EXISTS golden_json_tz_gmt;
CREATE EXTERNAL TABLE golden_json_tz_gmt (id INT4, t TIMESTAMP) USING JSON WITH ('timezone'='GMT') LOCATION '/tmp/graft_golden/json_tz_gmt';
SELECT id, t FROM golden_json_tz_gmt ORDER BY id;
