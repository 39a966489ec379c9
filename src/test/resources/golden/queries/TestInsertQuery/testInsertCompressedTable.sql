DROP TABLE IF EXISTS golden_ins_deflate;
CREATE TABLE golden_ins_deflate (col1 INT4, col2 INT4, col3 FLOAT8) USING TEXT WITH ('text.delimiter'='|','compression.codec'='org.apache.hadoop.io.compress.DeflateCodec');
INSERT OVERWRITE INTO golden_ins_deflate SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_orderkey = 3;
SELECT col1, col2, col3 FROM golden_ins_deflate ORDER BY col2;
