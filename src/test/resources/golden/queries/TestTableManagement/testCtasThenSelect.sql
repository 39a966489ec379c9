DROP TABLE IF EXISTS golden_region_copy;
CREATE TABLE golden_region_copy USING PARQUET AS SELECT * FROM region WHERE r_regionkey < 3;
SELECT * FROM golden_region_copy ORDER BY r_regionkey;
