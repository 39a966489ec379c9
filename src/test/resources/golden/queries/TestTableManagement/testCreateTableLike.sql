DROP TABLE IF EXISTS golden_like;
DROP TABLE IF EXISTS golden_like_src;
CREATE TABLE golden_like_src (id INT8, tag TEXT) USING PARQUET;
CREATE TABLE golden_like LIKE golden_like_src;
INSERT INTO golden_like VALUES (1, 'from-like');
SELECT id, tag FROM golden_like ORDER BY id;
