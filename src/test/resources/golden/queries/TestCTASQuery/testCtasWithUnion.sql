DROP TABLE IF EXISTS ctas_u1;
CREATE TABLE ctas_u1 AS SELECT r_regionkey AS k, r_name AS nm FROM region WHERE r_regionkey < 2 UNION SELECT r_regionkey AS k, r_name AS nm FROM region WHERE r_regionkey >= 2;
SELECT k, nm FROM ctas_u1 ORDER BY k;
