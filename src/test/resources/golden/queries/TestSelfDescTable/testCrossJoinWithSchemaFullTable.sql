-- reference: TestQueryOnSelfDescTable/testCrossJoin.sql shape — comma
-- cross join between a schema-full table and a self-describing one
DROP TABLE IF EXISTS sd_stage;
CREATE EXTERNAL TABLE sd_stage (rec RECORD (nkey INT4, nname TEXT, deep RECORD (rk INT4, score FLOAT8))) USING JSON LOCATION '/tmp/graft_golden/selfdesc1';
INSERT OVERWRITE INTO sd_stage SELECT named_struct('nkey', n_nationkey, 'nname', n_name, 'deep', named_struct('rk', n_regionkey, 'score', CAST(n_nationkey AS FLOAT8) * 0.5)) FROM nation;
DROP TABLE IF EXISTS sd_t;
CREATE EXTERNAL TABLE sd_t USING JSON LOCATION '/tmp/graft_golden/selfdesc1';
SELECT rec.nkey::int8 AS favs, l_linenumber, l_shipdate
FROM default.lineitem, sd_t
WHERE l_orderkey = 1 AND rec.nkey < 3
ORDER BY favs, l_linenumber
LIMIT 6;
