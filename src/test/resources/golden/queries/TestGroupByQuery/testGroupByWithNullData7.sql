-- reference: TestGroupByQuery/testGroupByWithNullData7.sql — the filter
-- leaves zero rows
DROP TABLE IF EXISTS testGroupByWithNullData7;
CREATE TABLE testGroupByWithNullData7 (age INT4, point FLOAT4);
select max(point) as maximum, count(distinct age) as unique_key from testGroupByWithNullData7 where age > 100;
