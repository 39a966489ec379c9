-- reference: TestCreateTable/negative/type_mismatch.sql — a declared CTAS
-- schema whose column count does not match the query output fails
CREATE TABLE mismatch1 (a TEXT, b TEXT) AS SELECT * FROM nation;
