-- reference: TestSQLAnalyzer/positive/select_9.sql
DROP TABLE IF EXISTS table1;
CREATE TABLE table1 (member_id TEXT, member_name TEXT, post_code TEXT);
INSERT INTO table1 VALUES ('10001', 'ann', NULL), ('10002', NULL, '04524'), ('10003', 'cho', NULL);
SELECT A.*
FROM table1 AS A
WHERE A.member_name is not null
and A.post_code is null
order by A.member_id;
