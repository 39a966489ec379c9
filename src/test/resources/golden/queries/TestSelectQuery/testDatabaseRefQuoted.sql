CREATE DATABASE IF NOT EXISTS refdb2;
DROP TABLE IF EXISTS refdb2.li_small;
CREATE TABLE refdb2.li_small AS SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey < 5;
SELECT "refdb2"."li_small".l_orderkey FROM "refdb2"."li_small" ORDER BY l_orderkey;
