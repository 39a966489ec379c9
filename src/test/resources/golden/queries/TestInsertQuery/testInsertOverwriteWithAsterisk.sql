DROP TABLE IF EXISTS ins_ast;
CREATE TABLE ins_ast AS SELECT * FROM region WHERE r_regionkey < 2;
INSERT OVERWRITE INTO ins_ast SELECT * FROM region;
SELECT r_regionkey, r_name FROM ins_ast ORDER BY r_regionkey;
