DROP TABLE IF EXISTS trunc_li;
CREATE TABLE trunc_li AS SELECT * FROM lineitem WHERE l_orderkey < 10;
TRUNCATE trunc_li;
SELECT count(*) AS cnt FROM trunc_li;
