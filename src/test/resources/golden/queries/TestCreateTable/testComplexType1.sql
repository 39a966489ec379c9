-- reference: TestCreateTable/testComplexType1.sql — arrays of doubles,
-- records, maps, and arrays of arrays
CREATE DATABASE IF NOT EXISTS d11;
DROP TABLE IF EXISTS d11.complex_type1;
CREATE TABLE d11.complex_type1 (
  col1 array<double>,
  col2 array<record (last_name text, first_name text, age int)>,
  col3 array<map<text, text>>,
  col4 array<array<double>>
);
DESCRIBE d11.complex_type1;
