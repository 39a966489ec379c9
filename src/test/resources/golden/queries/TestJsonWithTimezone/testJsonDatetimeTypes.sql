INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/json_dt' USING JSON SELECT 1 AS id, '2024-06-01 12:34:56' AS t_timestamp, '12:34:56' AS t_time, '2024-06-01' AS t_date;
DROP TABLE IF EXISTS golden_json_dt;
CREATE EXTERNAL TABLE golden_json_dt (id INT4, t_timestamp TIMESTAMP, t_time TEXT, t_date DATE) USING JSON LOCATION '/tmp/graft_golden/json_dt';
SELECT id, t_timestamp, t_time::time AS t_time, t_date FROM golden_json_dt;
