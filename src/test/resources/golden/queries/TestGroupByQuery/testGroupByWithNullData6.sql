-- reference: TestGroupByQuery/testGroupByWithNullData6.sql — distinct
-- count and max over an EMPTY table
DROP TABLE IF EXISTS testGroupByWithNullData6;
CREATE TABLE testGroupByWithNullData6 (age INT4, point FLOAT4);
select count(distinct age) as unique_key, max(point) as maximum from testGroupByWithNullData6;
