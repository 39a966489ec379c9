-- reference: TestAlterTable/alter_table_add_partition2.sql — IF NOT EXISTS
-- makes the duplicate add a no-op
DROP TABLE IF EXISTS partitioned_table;
create table partitioned_table (col1 int4, col2 int4) partition by column(col3 int4, col4 int4);
ALTER TABLE partitioned_table ADD PARTITION (col3 = 1 , col4 = 2);
ALTER TABLE partitioned_table ADD IF NOT EXISTS PARTITION (col3 = 1 , col4 = 2);
SHOW PARTITIONS partitioned_table;
