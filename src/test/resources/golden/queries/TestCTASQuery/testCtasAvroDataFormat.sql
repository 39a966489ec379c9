DROP TABLE IF EXISTS ctas_avro_fmt;
CREATE TABLE ctas_avro_fmt USING AVRO AS SELECT r_regionkey, r_name FROM region;
SELECT r_regionkey, r_name FROM ctas_avro_fmt ORDER BY r_regionkey;
