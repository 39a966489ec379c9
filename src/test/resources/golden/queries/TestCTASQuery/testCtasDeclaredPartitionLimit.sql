DROP TABLE IF EXISTS ctas_decl_part_lim;
CREATE TABLE ctas_decl_part_lim (col1 FLOAT4, col2 FLOAT4) PARTITION BY COLUMN(key FLOAT8) AS
SELECT sum(l_orderkey) AS total1, avg(l_partkey) AS total2, l_quantity AS key
FROM lineitem GROUP BY l_quantity ORDER BY l_quantity LIMIT 3;
SELECT * FROM ctas_decl_part_lim ORDER BY key;
