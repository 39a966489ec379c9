CREATE DATABASE IF NOT EXISTS refdb;
DROP TABLE IF EXISTS refdb.nation_small;
CREATE TABLE refdb.nation_small AS SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5;
SELECT n_nationkey, n_name FROM refdb.nation_small ORDER BY n_nationkey;
