DROP TABLE IF EXISTS golden_alter;
CREATE TABLE golden_alter (id INT4) USING PARQUET;
INSERT INTO golden_alter VALUES (1), (2);
ALTER TABLE golden_alter ADD COLUMN note TEXT;
INSERT INTO golden_alter VALUES (3, 'tagged');
SELECT id, note FROM golden_alter ORDER BY id;
