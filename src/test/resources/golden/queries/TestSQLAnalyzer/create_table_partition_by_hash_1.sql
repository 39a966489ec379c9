-- reference: TestSQLAnalyzer/create_table_partition_by_hash_1.sql — the
-- reference parses HASH partitions but never implements them; the engine
-- rejects loudly instead of creating a table it cannot fill
DROP TABLE IF EXISTS sales;
CREATE TABLE sales ( col1 int, col2 int)
PARTITION BY HASH (col1)
PARTITIONS 2;
