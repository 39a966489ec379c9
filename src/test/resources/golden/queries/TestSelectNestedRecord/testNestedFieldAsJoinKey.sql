INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/nested_join' USING JSON SELECT n_nationkey AS id, NAMED_STRUCT('rk', n_regionkey) AS ref FROM nation WHERE n_nationkey < 8;
DROP TABLE IF EXISTS nested_join_read;
CREATE EXTERNAL TABLE nested_join_read (id INT8, ref RECORD (rk INT8)) USING JSON LOCATION '/tmp/graft_golden/nested_join';
SELECT t.id, r.r_name
FROM nested_join_read t JOIN region r ON t.ref.rk = r.r_regionkey
ORDER BY t.id;
