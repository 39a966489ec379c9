INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/nested_tweets2' USING JSON SELECT named_struct('id', n_nationkey % 3, 'name', n_name) AS user, n_regionkey AS retweet_count FROM nation WHERE n_nationkey < 6;
DROP TABLE IF EXISTS golden_tweets2;
CREATE EXTERNAL TABLE golden_tweets2 (user RECORD (id INT4, name TEXT), retweet_count INT4) USING JSON LOCATION '/tmp/graft_golden/nested_tweets2';
SELECT t1.user.id AS id1, t1.user.name AS name1, t2.user.name AS name2
FROM golden_tweets2 t1 JOIN golden_tweets2 t2 ON t1.user.id = t2.user.id
ORDER BY id1, name1, name2;
