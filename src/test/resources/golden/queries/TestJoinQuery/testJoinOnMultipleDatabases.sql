CREATE DATABASE IF NOT EXISTS jdb1;
CREATE DATABASE IF NOT EXISTS jdb2;
DROP TABLE IF EXISTS jdb1.nat;
DROP TABLE IF EXISTS jdb2.reg;
CREATE TABLE jdb1.nat AS SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey < 8;
CREATE TABLE jdb2.reg AS SELECT r_regionkey, r_name FROM region;
SELECT a.n_name, b.r_name
FROM jdb1.nat a JOIN jdb2.reg b ON a.n_regionkey = b.r_regionkey
ORDER BY a.n_name;
