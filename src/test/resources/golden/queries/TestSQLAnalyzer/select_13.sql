-- reference: TestSQLAnalyzer/positive/select_13.sql — alias without AS
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (member_id TEXT, member_name TEXT);
INSERT INTO table1 VALUES ('10001', 'ann'), ('10002', 'bob');
select A.*
from table1  A
order by A.member_id;
