DROP TABLE IF EXISTS golden_idx_d;
CREATE TABLE golden_idx_d USING PARQUET AS SELECT s_suppkey, s_nationkey FROM supplier;
CREATE INDEX g_idx_drop ON golden_idx_d (s_suppkey);
DROP INDEX g_idx_drop;
SELECT s_suppkey, s_nationkey FROM golden_idx_d WHERE s_suppkey <= 5 ORDER BY s_suppkey;
