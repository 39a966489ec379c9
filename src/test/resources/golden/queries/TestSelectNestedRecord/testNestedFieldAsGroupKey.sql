INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/nested_grp' USING JSON SELECT n_nationkey AS id, NAMED_STRUCT('region', NAMED_STRUCT('key', n_regionkey, 'tag', CONCAT('R', CAST(n_regionkey AS TEXT)))) AS meta FROM nation;
DROP TABLE IF EXISTS nested_grp_read;
CREATE EXTERNAL TABLE nested_grp_read (id INT8, meta RECORD (region RECORD (key INT8, tag TEXT))) USING JSON LOCATION '/tmp/graft_golden/nested_grp';
SELECT meta.region.tag AS tag, COUNT(*) AS cnt, MIN(id) AS min_id
FROM nested_grp_read
GROUP BY meta.region.tag
ORDER BY tag;
