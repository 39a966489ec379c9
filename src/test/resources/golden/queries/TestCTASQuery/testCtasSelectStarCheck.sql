DROP TABLE IF EXISTS ctas_star_src;
CREATE TABLE ctas_star_src AS SELECT r_regionkey, r_name FROM region;
DROP TABLE IF EXISTS ctas_star_copy;
CREATE TABLE ctas_star_copy AS SELECT * FROM ctas_star_src;
SELECT DISTINCT * FROM ctas_star_copy ORDER BY r_regionkey;
