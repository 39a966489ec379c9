DROP TABLE IF EXISTS ctas_ctrla;
CREATE TABLE ctas_ctrla (col1 FLOAT4, col2 FLOAT4) USING TEXT WITH ('text.delimiter'='\u0001') AS
SELECT sum(l_orderkey) AS total1, avg(l_partkey) AS total2
FROM lineitem GROUP BY l_quantity ORDER BY l_quantity LIMIT 3;
SELECT col1, col2 FROM ctas_ctrla ORDER BY col1;
