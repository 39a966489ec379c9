DROP TABLE IF EXISTS golden_time;
CREATE TABLE golden_time (id INT4, t TIME) USING PARQUET;
INSERT INTO golden_time VALUES (1, TIME '08:30:00'), (2, TIME '17:45:30'), (3, TIME '00:00:01');
SELECT id, t FROM golden_time WHERE t > TIME '08:00:00' ORDER BY id;
