-- reference: TestCreateTable/negative/map_type.sql — negative there only
-- because the reference's Hive-metastore catalog cannot store MAP columns;
-- this engine's catalog can (exceeds the reference), so the same three
-- shapes create positively, including MAP of RECORD and nested RECORD
DROP TABLE IF EXISTS map_t1;
DROP TABLE IF EXISTS map_t2;
DROP TABLE IF EXISTS map_t3;
CREATE TABLE map_t1 (a TEXT, b INT4, c MAP<TEXT, INT8>, f FLOAT8);
CREATE TABLE map_t2 (a TEXT, b INT4, c MAP<TEXT, RECORD (name TEXT, age INT4)>, f FLOAT8);
CREATE TABLE map_t3 (a TEXT, b INT4, c MAP<TEXT, RECORD (name RECORD (first_name TEXT, last_name TEXT), age INT4)>, f FLOAT8);
DESCRIBE map_t3;
