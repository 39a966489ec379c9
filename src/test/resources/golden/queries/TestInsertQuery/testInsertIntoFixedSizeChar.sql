DROP TABLE IF EXISTS ins_char;
CREATE TABLE ins_char (id INT4, code CHAR(5));
INSERT INTO ins_char VALUES (1, 'ab'), (2, 'abcde');
SELECT id, code, LENGTH(code) AS code_len, CONCAT('[', code, ']') AS bracketed FROM ins_char ORDER BY id;
