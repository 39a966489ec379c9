DROP TABLE IF EXISTS ctas_gb_part;
CREATE TABLE ctas_gb_part (col1 FLOAT8, col2 FLOAT8) PARTITION BY COLUMN(key FLOAT8) AS
SELECT sum(l_orderkey) AS total1, avg(l_partkey) AS total2, l_quantity AS key
FROM lineitem GROUP BY l_quantity;
SELECT * FROM ctas_gb_part WHERE key IN (1.0, 2.0, 3.0) ORDER BY key;
