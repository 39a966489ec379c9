-- reference: TestQueryOnSelfDescTable/testJoinWithSchemaFullTable2.sql
-- shape — a self-describing table joined against THREE schema-full tables
DROP TABLE IF EXISTS sd_stage;
CREATE EXTERNAL TABLE sd_stage (rec RECORD (nkey INT4, nname TEXT, deep RECORD (rk INT4, score FLOAT8))) USING JSON LOCATION '/tmp/graft_golden/selfdesc1';
INSERT OVERWRITE INTO sd_stage SELECT named_struct('nkey', n_nationkey, 'nname', n_name, 'deep', named_struct('rk', n_regionkey, 'score', CAST(n_nationkey AS FLOAT8) * 0.5)) FROM nation;
DROP TABLE IF EXISTS sd_t;
CREATE EXTERNAL TABLE sd_t USING JSON LOCATION '/tmp/graft_golden/selfdesc1';
SELECT rec.nkey::int8 AS favs, l_linenumber, s_name
FROM default.lineitem, sd_t, default.orders, default.supplier
WHERE rec.nkey::int8 = (l_orderkey - 1) AND l_orderkey = o_orderkey AND l_linenumber = s_suppkey
ORDER BY favs, l_linenumber, s_name
LIMIT 10;
