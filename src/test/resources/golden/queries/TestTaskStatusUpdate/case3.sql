-- reference: TestTaskStatusUpdate/case3.sql — self-join of a
-- column-partitioned table on its partition key with an OR predicate
DROP TABLE IF EXISTS columnpartitionedtable;
CREATE TABLE ColumnPartitionedTable (col1 int4, col2 text) PARTITION BY COLUMN (key float8);
INSERT OVERWRITE INTO ColumnPartitionedTable SELECT l_orderkey, l_returnflag, l_quantity FROM lineitem WHERE l_orderkey < 8 AND l_linenumber = 1;
select *
from (
  select a.col1, a.col2, a.key
  from ColumnPartitionedTable a
  join ColumnPartitionedTable b on a.key = b.key
  where
    (a.key = 50.0 or a.key = 26.0)
) test
order by
  col1, col2;
