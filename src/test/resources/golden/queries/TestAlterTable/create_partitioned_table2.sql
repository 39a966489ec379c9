-- reference: TestAlterTable/create_partitioned_table2.sql — delimited text
-- storage with the partition columns declared outside the schema
DROP TABLE IF EXISTS partitioned_table2;
create table partitioned_table2 (col3 float8, col4 text) USING text  WITH ('text.delimiter'='|') PARTITION by column(col1 int4, col2 int4);
INSERT INTO partitioned_table2 SELECT 0.5, 'a', 1, 2;
INSERT INTO partitioned_table2 SELECT 1.5, 'b', 3, 4;
SELECT col3, col4, col1, col2 FROM partitioned_table2 ORDER BY col3;
