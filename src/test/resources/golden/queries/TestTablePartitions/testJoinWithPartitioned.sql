DROP TABLE IF EXISTS part_lineitem;
CREATE TABLE part_lineitem (col1 INT4, col2 INT4, null_col INT4) PARTITION BY COLUMN(key FLOAT8);
INSERT OVERWRITE INTO part_lineitem (col1, col2, key) SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_orderkey <= 100;
SELECT l.l_orderkey, p.col1, p.key
FROM lineitem AS l, part_lineitem AS p
WHERE (p.key = 45.0 OR p.key = 38.0) AND l.l_orderkey = p.col1
ORDER BY l.l_orderkey, p.col1, p.key, l.l_linenumber;
