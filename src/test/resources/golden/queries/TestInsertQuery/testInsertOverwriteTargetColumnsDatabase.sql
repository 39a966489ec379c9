CREATE DATABASE IF NOT EXISTS insdb2;
DROP TABLE IF EXISTS insdb2.nation_tc;
CREATE TABLE insdb2.nation_tc (nkey INT4, nname TEXT, nregion INT4);
INSERT OVERWRITE INTO insdb2.nation_tc (nkey, nregion) SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey < 5;
INSERT OVERWRITE INTO insdb2.nation_tc (nkey, nname) SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5;
SELECT nkey, nname, nregion FROM insdb2.nation_tc ORDER BY nkey;
