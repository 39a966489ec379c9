INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/mb_null' USING TEXT WITH ('text.delimiter'='||', 'text.null'='@NULL@') SELECT n_nationkey, CASE WHEN n_regionkey = 0 THEN NULL ELSE n_name END AS nm FROM nation;
DROP TABLE IF EXISTS mb_null_read;
CREATE EXTERNAL TABLE mb_null_read (nkey INT4, nname TEXT) USING TEXT WITH ('text.delimiter'='||', 'text.null'='@NULL@') LOCATION '/tmp/graft_golden/mb_null';
SELECT nkey, nname FROM mb_null_read WHERE nname IS NULL ORDER BY nkey;
