-- reference: TestAlterTable/alter_table_drop_partition2.sql — IF EXISTS on
-- a partition that is not registered
DROP TABLE IF EXISTS partitioned_table;
create table partitioned_table (col1 int4, col2 int4) partition by column(col3 int4, col4 int4);
ALTER TABLE partitioned_table DROP IF EXISTS PARTITION (col3 = 1 , col4 = 2) PURGE;
SHOW PARTITIONS partitioned_table;
