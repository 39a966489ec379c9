-- reference: TestAlterTable/alter_table_add_partition1.sql +
-- create_partitioned_table.sql fixture
DROP TABLE IF EXISTS partitioned_table;
create table partitioned_table (col1 int4, col2 int4) partition by column(col3 int4, col4 int4);
ALTER TABLE partitioned_table ADD PARTITION (col3 = 1 , col4 = 2);
SHOW PARTITIONS partitioned_table;
