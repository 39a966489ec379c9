DROP TABLE IF EXISTS golden_idx_c;
CREATE TABLE golden_idx_c USING PARQUET AS SELECT o_orderkey, o_totalprice FROM orders;
CREATE INDEX g_idx_expr ON golden_idx_c (o_totalprice / 10);
SELECT o_orderkey, o_totalprice FROM golden_idx_c WHERE o_totalprice / 10 < 500 ORDER BY o_orderkey;
