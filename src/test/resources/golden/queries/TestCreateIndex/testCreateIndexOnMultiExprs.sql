-- reference: TestCreateIndex/testCreateIndexOnMultiExprs.sql — index on an
-- arithmetic multi-column expression with a partial-index WHERE clause
-- (the re-layout sorts on the computed value; the predicate is a build
-- hint the engine does not need)
DROP TABLE IF EXISTS golden_idx_d;
CREATE TABLE golden_idx_d USING PARQUET AS SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem;
create index l_orderkey_100_l_linenumber_10_lt10_idx on golden_idx_d (l_orderkey*100-l_linenumber*10 asc nulls first) where l_orderkey*100 > 10;
SELECT l_orderkey, l_linenumber FROM golden_idx_d WHERE l_orderkey*100 - l_linenumber*10 < 300 ORDER BY l_orderkey, l_linenumber;
