-- reference: TestSQLAnalyzer/positive/select_6.sql
DROP TABLE IF EXISTS test;
CREATE TABLE test (ipv4_src_ip TEXT);
INSERT INTO test VALUES ('10.0.0.1'), ('192.168.0.7');
select ipv4_src_ip from test order by ipv4_src_ip;
