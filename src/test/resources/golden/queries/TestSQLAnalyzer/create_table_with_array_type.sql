-- reference: TestSQLAnalyzer/positive/create_table_with_array_type.sql —
-- the reference text declares col3 twice; parsing accepts it, execution
-- rejects the duplicate column loudly
DROP TABLE IF EXISTS table1;
create table table1 (
  col1 array<int>,
  col2 array<text>,
  col3 array<record (name text, age int)>,
  col3 array<array<float>>
);
