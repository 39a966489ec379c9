DROP TABLE IF EXISTS like_esc;
CREATE TABLE like_esc (id INT4, s TEXT);
INSERT INTO like_esc VALUES (1, '100%'), (2, '100x'), (3, 'a_b'), (4, 'axb');
SELECT id, s FROM like_esc WHERE s LIKE '100\%' ORDER BY id;
