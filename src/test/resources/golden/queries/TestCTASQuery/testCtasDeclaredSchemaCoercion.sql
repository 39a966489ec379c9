DROP TABLE IF EXISTS ctas_decl1;
CREATE TABLE ctas_decl1 (col1 FLOAT4, col2 FLOAT4) USING PARQUET AS
SELECT sum(l_orderkey) AS total1, avg(l_partkey) AS total2
FROM lineitem GROUP BY l_quantity ORDER BY l_quantity LIMIT 3;
SELECT col1, col2 FROM ctas_decl1 ORDER BY col1;
