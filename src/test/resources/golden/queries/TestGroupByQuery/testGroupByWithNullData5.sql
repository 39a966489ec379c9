-- reference: TestGroupByQuery/testGroupByWithNullData5.sql — count over an
-- EMPTY table
DROP TABLE IF EXISTS testGroupByWithNullData5;
CREATE TABLE testGroupByWithNullData5 (age INT4, point FLOAT4);
select count(1) as unique_key from testGroupByWithNullData5;
