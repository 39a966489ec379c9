DROP TABLE IF EXISTS orc_agg;
CREATE TABLE orc_agg USING ORC AS SELECT n_regionkey, n_nationkey FROM nation;
SELECT n_regionkey, COUNT(*) AS cnt, SUM(n_nationkey) AS total
FROM orc_agg
GROUP BY n_regionkey
ORDER BY n_regionkey;
