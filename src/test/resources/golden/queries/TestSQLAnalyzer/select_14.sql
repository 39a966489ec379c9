-- reference: TestSQLAnalyzer/positive/select_14.sql
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (member_id TEXT, member_name TEXT);
INSERT INTO table1 VALUES ('10001', 'ann'), ('10002', 'bob');
select *
from table1
order by member_id;
