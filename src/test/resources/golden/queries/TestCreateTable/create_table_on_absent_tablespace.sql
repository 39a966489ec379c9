-- reference: TestCreateTable/negative/create_table_on_absent_tablespace
-- .sql — a TABLESPACE clause names a tablespace this single-warehouse
-- deployment does not have
CREATE TABLE cts_t1 (xxx TEXT) TABLESPACE unknown;
