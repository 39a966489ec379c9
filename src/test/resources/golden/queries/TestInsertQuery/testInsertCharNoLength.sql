DROP TABLE IF EXISTS golden_char_nolen;
CREATE TABLE golden_char_nolen (col1 CHAR);
INSERT INTO golden_char_nolen SELECT 'a';
SELECT col1 FROM golden_char_nolen;
