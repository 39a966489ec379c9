-- reference: TestAlterTable/create_partitioned_table.sql — two data
-- columns with two partition columns declared outside the schema
DROP TABLE IF EXISTS partitioned_table;
create table partitioned_table (col1 int4, col2 int4) partition by column(col3 int4, col4 int4);
INSERT INTO partitioned_table SELECT 1, 2, 3, 4;
INSERT INTO partitioned_table SELECT 5, 6, 7, 8;
SELECT col1, col2, col3, col4 FROM partitioned_table ORDER BY col1;
