DROP TABLE IF EXISTS ctas_vals;
CREATE TABLE ctas_vals AS SELECT * FROM VALUES (1, 'one'), (2, 'two'), (3, 'three') AS t(id, word);
SELECT id, word FROM ctas_vals ORDER BY id;
