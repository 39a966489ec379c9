INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/nested_tweets' USING JSON SELECT named_struct('id', n_nationkey % 5, 'name', concat('user_', CAST(n_nationkey % 5 AS TEXT))) AS user, n_regionkey AS retweet_count FROM nation;
DROP TABLE IF EXISTS golden_tweets;
CREATE EXTERNAL TABLE golden_tweets (user RECORD (id INT4, name TEXT), retweet_count INT4) USING JSON LOCATION '/tmp/graft_golden/nested_tweets';
SELECT user.name, sum(retweet_count) AS total_retweet FROM golden_tweets GROUP BY user.name ORDER BY user.name;
