-- reference: TestCreateTable/positive/create_table_if_not_exists.sql —
-- IF NOT EXISTS is a no-op against an existing table for both the
-- declared-schema and the CTAS form (managed half; the external half
-- needs the harness's pre-mounted catalog lineitem)
DROP TABLE IF EXISTS cnie_t1;
CREATE TABLE cnie_t1 (num INT8);
INSERT INTO cnie_t1 VALUES (42);
CREATE TABLE IF NOT EXISTS cnie_t1 (xxx TEXT);
CREATE TABLE IF NOT EXISTS cnie_t1 AS SELECT 1;
SELECT num FROM cnie_t1;
