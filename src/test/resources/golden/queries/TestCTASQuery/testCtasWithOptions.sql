DROP TABLE IF EXISTS ctas_o1;
CREATE TABLE ctas_o1 USING TEXT WITH ('text.delimiter'='|') AS SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5;
SELECT n_nationkey, n_name FROM ctas_o1 ORDER BY n_nationkey;
