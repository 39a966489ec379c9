DROP TABLE IF EXISTS golden_idx_b;
CREATE TABLE golden_idx_b USING PARQUET AS SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem;
CREATE INDEX g_idx_multi ON golden_idx_b (l_orderkey ASC, l_linenumber DESC);
SELECT l_orderkey, l_linenumber FROM golden_idx_b WHERE l_orderkey BETWEEN 1 AND 8 ORDER BY l_orderkey, l_linenumber;
