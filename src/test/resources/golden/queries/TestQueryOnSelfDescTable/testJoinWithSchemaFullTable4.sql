DROP TABLE IF EXISTS sd3_stage;
CREATE EXTERNAL TABLE sd3_stage (user RECORD (favourites_count TEXT, time_zone TEXT, profile_sidebar_fill_color TEXT), retweet_count TEXT, coordinates TEXT, created_at TEXT, id INT8) USING JSON LOCATION '/tmp/graft_golden/sd3';
INSERT OVERWRITE INTO sd3_stage SELECT named_struct('favourites_count', CAST(n_nationkey AS STRING), 'time_zone', CONCAT('TZ_', CAST(n_regionkey AS STRING)), 'profile_sidebar_fill_color', CONCAT('F', CAST(n_nationkey % 3 AS STRING))), CAST(n_nationkey * 2 AS STRING), CONCAT('C', CAST(n_regionkey AS STRING)), CONCAT('2024-01-', LPAD(CAST(n_nationkey + 1 AS STRING), 2, '0')), CAST(n_nationkey AS BIGINT) FROM nation;
DROP TABLE IF EXISTS self_desc_table3;
CREATE EXTERNAL TABLE self_desc_table3 USING JSON LOCATION '/tmp/graft_golden/sd3';
DROP TABLE IF EXISTS sd1_stage;
CREATE EXTERNAL TABLE sd1_stage (name RECORD (first_name TEXT, last_name TEXT)) USING JSON LOCATION '/tmp/graft_golden/sd1';
INSERT OVERWRITE INTO sd1_stage SELECT named_struct('first_name', CONCAT('FN_', CAST(n_nationkey % 4 AS STRING)), 'last_name', n_name) FROM nation;
DROP TABLE IF EXISTS self_desc_table1;
CREATE EXTERNAL TABLE self_desc_table1 USING JSON LOCATION '/tmp/graft_golden/sd1';
SELECT self_desc_table3.user.favourites_count::int8, l_linenumber, l_returnflag
FROM default.lineitem, self_desc_table1, self_desc_table3, default.orders, default.supplier
WHERE self_desc_table3.user.favourites_count::int8 = (l_orderkey - 1) AND l_orderkey = o_orderkey AND l_linenumber = s_suppkey AND self_desc_table3.user.favourites_count <> self_desc_table1.name.first_name
ORDER BY 1, 2, 3 LIMIT 20;
