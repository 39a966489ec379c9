DROP TABLE IF EXISTS ctas_seq_fmt;
CREATE TABLE ctas_seq_fmt (k INT4, nm TEXT) USING SEQUENCEFILE WITH ('text.delimiter'='|') AS
SELECT n_nationkey, n_name FROM nation;
SELECT k, nm FROM ctas_seq_fmt ORDER BY k;
