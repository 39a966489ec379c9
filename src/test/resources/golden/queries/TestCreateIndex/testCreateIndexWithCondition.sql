-- reference: TestCreateIndex/testCreateIndexWithCondition.sql — mixed
-- ASC/DESC keys with a WHERE condition
DROP TABLE IF EXISTS golden_idx_e;
CREATE TABLE golden_idx_e USING PARQUET AS SELECT l_orderkey, l_partkey FROM lineitem;
create index l_orderkey_partkey_lt10_idx on golden_idx_e (l_orderkey asc, l_partkey desc) where l_partkey > 10;
SELECT l_orderkey, l_partkey FROM golden_idx_e WHERE l_orderkey < 3 AND l_partkey > 10 ORDER BY l_orderkey, l_partkey;
