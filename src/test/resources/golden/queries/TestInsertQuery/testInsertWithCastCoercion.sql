DROP TABLE IF EXISTS ins_coerce;
CREATE TABLE ins_coerce (small INT4, big INT8, txt TEXT, f FLOAT8);
INSERT INTO ins_coerce SELECT CAST(r_regionkey AS INT4), r_regionkey, CAST(r_regionkey AS TEXT), r_regionkey FROM region;
SELECT small, big, txt, f FROM ins_coerce ORDER BY small;
