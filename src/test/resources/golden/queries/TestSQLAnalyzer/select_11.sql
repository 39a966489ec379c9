-- reference: TestSQLAnalyzer/positive/select_11.sql — string and numeric
-- range predicates combined
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (member_id TEXT, member_name TEXT, age INT4);
INSERT INTO table1 VALUES ('10001', 'ann', 35), ('15000', 'bob', 60), ('25000', 'cho', 40);
select A.member_id, A.member_name
from table1 AS A
where A.member_id >= '10000'
and A.member_id <= '20000'
and A.age >= 30
and A.age <= 50
order by A.member_id;
