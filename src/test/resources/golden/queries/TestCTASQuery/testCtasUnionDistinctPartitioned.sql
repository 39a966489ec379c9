DROP TABLE IF EXISTS ctas_union_part;
CREATE TABLE ctas_union_part (col1 FLOAT8, col2 FLOAT8) PARTITION BY COLUMN(key FLOAT8) AS
SELECT * FROM (
  SELECT * FROM (SELECT sum(l_orderkey) AS total1, avg(l_partkey) AS total2, l_quantity AS key
                 FROM lineitem GROUP BY l_quantity ORDER BY l_quantity LIMIT 3) u1
  UNION
  SELECT * FROM (SELECT sum(l_orderkey) AS total1, avg(l_partkey) AS total2, l_quantity AS key
                 FROM lineitem GROUP BY l_quantity ORDER BY l_quantity LIMIT 3) u2
) t1;
SELECT * FROM ctas_union_part ORDER BY key;
