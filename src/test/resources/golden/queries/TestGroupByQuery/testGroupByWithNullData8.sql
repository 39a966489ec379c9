-- reference: TestGroupByQuery/testGroupByWithNullData8.sql
DROP TABLE IF EXISTS testGroupByWithNullData8;
CREATE TABLE testGroupByWithNullData8 (age INT4, point FLOAT4);
select max(point) as maximum, count(age) as unique_key from testGroupByWithNullData8;
