DROP TABLE IF EXISTS part_nullkey;
CREATE TABLE part_nullkey (v INT4) PARTITION BY COLUMN(p INT4);
INSERT INTO part_nullkey VALUES (1, 10), (2, NULL), (3, NULL);
SELECT v, p FROM part_nullkey WHERE p IS NULL ORDER BY v;
