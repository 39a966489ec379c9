DROP TABLE IF EXISTS golden_idx_a;
CREATE TABLE golden_idx_a USING PARQUET AS SELECT o_orderkey, o_custkey, o_totalprice FROM orders;
CREATE INDEX g_idx_cust ON golden_idx_a (o_custkey);
SELECT o_custkey, COUNT(*) AS cnt FROM golden_idx_a WHERE o_custkey BETWEEN 10 AND 20 GROUP BY o_custkey ORDER BY o_custkey;
