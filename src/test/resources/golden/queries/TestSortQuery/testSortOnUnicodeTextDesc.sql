DROP TABLE IF EXISTS sort_uni_d;
CREATE TABLE sort_uni_d (id INT4, word TEXT);
INSERT INTO sort_uni_d VALUES (1, 'apple'), (2, 'Ärger'), (3, '가나다'), (4, 'zebra'), (5, 'éclair');
SELECT id, word FROM sort_uni_d ORDER BY word DESC;
