DROP TABLE IF EXISTS golden_orc;
CREATE TABLE golden_orc USING ORC AS SELECT n_nationkey, n_name, n_regionkey FROM nation;
SELECT n_nationkey, n_name FROM golden_orc WHERE n_nationkey < 5 ORDER BY n_nationkey;
