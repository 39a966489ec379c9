-- reference: TestSQLAnalyzer/positive/select_10.sql
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (member_id TEXT, member_name TEXT);
INSERT INTO table1 VALUES ('10001', 'ann'), ('10002', 'bob');
select B.*
from (
  select A.member_id, A.member_name
  from table1 AS A
) B
order by B.member_id;
