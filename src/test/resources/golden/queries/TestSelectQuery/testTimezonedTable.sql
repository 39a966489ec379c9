INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/tz_csv' USING TEXT WITH ('text.delimiter'='|') SELECT 1 AS id, '2024-06-01 12:00:00' AS t UNION ALL SELECT 2, '2024-12-31 23:30:00';
DROP TABLE IF EXISTS tz_csv_read;
CREATE EXTERNAL TABLE tz_csv_read (id INT4, t TIMESTAMP) USING TEXT WITH ('text.delimiter'='|', 'timezone'='GMT+9') LOCATION '/tmp/graft_golden/tz_csv';
SELECT id, t FROM tz_csv_read ORDER BY id;
