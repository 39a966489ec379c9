INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/multibyte' USING TEXT WITH ('text.delimiter'='||') SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5;
DROP TABLE IF EXISTS golden_multibyte;
CREATE EXTERNAL TABLE golden_multibyte (nkey INT4, nname TEXT) USING TEXT WITH ('text.delimiter'='||') LOCATION '/tmp/graft_golden/multibyte';
SELECT nkey, nname FROM golden_multibyte ORDER BY nkey;
