DROP TABLE IF EXISTS ins_union;
CREATE TABLE ins_union (k INT4, nm TEXT);
INSERT OVERWRITE INTO ins_union
SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 2
UNION ALL
SELECT n_nationkey, n_name FROM nation WHERE n_nationkey > 22;
SELECT k, nm FROM ins_union ORDER BY k;
