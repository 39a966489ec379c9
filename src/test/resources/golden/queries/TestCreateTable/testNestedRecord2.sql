-- reference: TestCreateTable/testNestedRecord2.sql — records nested two
-- levels with repeated field names at different paths
CREATE DATABASE IF NOT EXISTS d9;
DROP TABLE IF EXISTS d9.nested_table2;
CREATE TABLE D9.nested_table2 (f1 int, nf1 record (f1 int4, f3 double), nf2 record (f1 int4, nf1 record (f1 int4, f2 text), nf2 record (f1 int4, f2 text), f2 double), f2 text);
DESCRIBE d9.nested_table2;
