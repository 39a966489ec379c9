DROP TABLE IF EXISTS ins_empty;
CREATE TABLE ins_empty (k INT4, nm TEXT);
INSERT INTO ins_empty SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 2;
INSERT INTO ins_empty SELECT r_regionkey, r_name FROM region WHERE r_regionkey > 99;
SELECT k, nm FROM ins_empty ORDER BY k;
