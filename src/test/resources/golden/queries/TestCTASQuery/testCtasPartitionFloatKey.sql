DROP TABLE IF EXISTS ctas_float_parts;
CREATE TABLE ctas_float_parts PARTITION BY COLUMN(key FLOAT8) AS
SELECT l_orderkey AS col1, l_partkey AS col2, l_quantity AS key FROM lineitem WHERE l_orderkey < 100;
SELECT DISTINCT * FROM ctas_float_parts WHERE (key = 45.0 OR key = 38.0) ORDER BY col1, col2, key;
