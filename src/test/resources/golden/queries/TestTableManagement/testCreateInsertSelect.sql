DROP TABLE IF EXISTS golden_typed;
CREATE TABLE golden_typed (id INT8, tag TEXT, score FLOAT8) USING PARQUET;
INSERT INTO golden_typed VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, 'gamma', 3.25);
SELECT id, tag, CAST(score * 2 AS FLOAT8) AS doubled FROM golden_typed ORDER BY id;
