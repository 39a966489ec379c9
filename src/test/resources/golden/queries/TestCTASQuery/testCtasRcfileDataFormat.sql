DROP TABLE IF EXISTS ctas_rcfile_fmt;
CREATE TABLE ctas_rcfile_fmt (col1 FLOAT8, col2 FLOAT8) USING RCFILE AS
SELECT sum(l_orderkey) AS total1, avg(l_partkey) AS total2
FROM lineitem GROUP BY l_quantity ORDER BY l_quantity LIMIT 3;
SELECT * FROM ctas_rcfile_fmt ORDER BY col1;
