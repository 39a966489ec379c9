DROP TABLE IF EXISTS tz_orc;
CREATE TABLE tz_orc (id INT4, t TIMESTAMP) USING ORC WITH ('timezone'='GMT+9');
INSERT INTO tz_orc SELECT 1 AS id, '2024-06-01 12:00:00'::timestamp AS t UNION ALL SELECT 2, '2024-12-31 23:30:00'::timestamp;
SET TIME ZONE 'GMT+9';
DROP TABLE IF EXISTS tz_orc_snap;
CREATE TABLE tz_orc_snap AS SELECT id, t::text AS t_str FROM tz_orc;
SET TIME ZONE 'UTC';
SELECT id, t_str FROM tz_orc_snap ORDER BY id;
