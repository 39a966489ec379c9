DROP TABLE IF EXISTS ctas_union2;
CREATE TABLE ctas_union2 AS
SELECT r_regionkey AS k, r_name AS nm FROM region WHERE r_regionkey < 2
UNION ALL
SELECT n_nationkey, n_name FROM nation WHERE n_nationkey > 23;
SELECT k, nm FROM ctas_union2 ORDER BY k;
