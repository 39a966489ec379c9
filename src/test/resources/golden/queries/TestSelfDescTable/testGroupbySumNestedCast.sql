-- reference: TestQueryOnSelfDescTable/testGroupby3.sql shape — group by a
-- nested field, sum a ::int8-cast nested field
DROP TABLE IF EXISTS sd_stage;
CREATE EXTERNAL TABLE sd_stage (rec RECORD (nkey INT4, nname TEXT, deep RECORD (rk INT4, score FLOAT8))) USING JSON LOCATION '/tmp/graft_golden/selfdesc1';
INSERT OVERWRITE INTO sd_stage SELECT named_struct('nkey', n_nationkey, 'nname', n_name, 'deep', named_struct('rk', n_regionkey, 'score', CAST(n_nationkey AS FLOAT8) * 0.5)) FROM nation;
DROP TABLE IF EXISTS sd_t;
CREATE EXTERNAL TABLE sd_t USING JSON LOCATION '/tmp/graft_golden/selfdesc1';
SELECT rec.deep.rk AS tz, sum(rec.nkey::int8) AS favs FROM sd_t GROUP BY rec.deep.rk ORDER BY tz;
