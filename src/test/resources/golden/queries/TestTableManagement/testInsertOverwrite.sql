DROP TABLE IF EXISTS golden_ovw;
CREATE TABLE golden_ovw (k INT4, v TEXT) USING PARQUET;
INSERT INTO golden_ovw VALUES (1, 'old'), (2, 'old');
INSERT OVERWRITE INTO golden_ovw VALUES (7, 'new');
SELECT k, v FROM golden_ovw ORDER BY k;
