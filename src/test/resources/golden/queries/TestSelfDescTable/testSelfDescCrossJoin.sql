INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/sd_cross' USING JSON SELECT r_regionkey AS rk, r_name AS nm FROM region WHERE r_regionkey < 2;
DROP TABLE IF EXISTS sd_cross_read;
CREATE EXTERNAL TABLE sd_cross_read USING JSON LOCATION '/tmp/graft_golden/sd_cross';
SELECT a.rk, a.nm, b.rk AS rk2
FROM sd_cross_read a CROSS JOIN sd_cross_read b
ORDER BY a.rk, b.rk;
