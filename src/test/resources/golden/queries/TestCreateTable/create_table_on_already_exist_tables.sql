-- reference: TestCreateTable/negative/create_table_on_already_exist_tables
-- .sql — CREATE TABLE without IF NOT EXISTS over an existing table fails
DROP TABLE IF EXISTS cnae_t1;
CREATE TABLE cnae_t1 (num INT8);
CREATE TABLE cnae_t1 (xxx TEXT);
