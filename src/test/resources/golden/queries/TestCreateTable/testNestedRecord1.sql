-- reference: TestCreateTable/testNestedRecord1.sql
CREATE DATABASE IF NOT EXISTS d9;
DROP TABLE IF EXISTS d9.nested_table;
CREATE TABLE D9.nested_table (f1 int, nested_field record (f2 int4, f3 int8), f3 text);
DESCRIBE d9.nested_table;
