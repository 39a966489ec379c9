-- reference: TestAlterTable/alter_table_drop_partition1.sql
DROP TABLE IF EXISTS partitioned_table;
create table partitioned_table (col1 int4, col2 int4) partition by column(col3 int4, col4 int4);
ALTER TABLE partitioned_table ADD PARTITION (col3 = 1 , col4 = 2);
ALTER TABLE partitioned_table ADD PARTITION (col3 = 5 , col4 = 6);
ALTER TABLE partitioned_table DROP PARTITION (col3 = 1 , col4 = 2) PURGE;
SHOW PARTITIONS partitioned_table;
