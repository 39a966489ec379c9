-- reference: TestCreateTable/quoted_identifier_mixed_chars_ddl_1.sql —
-- quoted identifiers keep their exact case (fixture created managed with
-- data instead of the harness's ${table.path} template)
DROP TABLE IF EXISTS "TABLE1";
CREATE TABLE "TABLE1" ("aGe" int, "teXt" text, "Number" int);
INSERT INTO "TABLE1" VALUES (30, 'ann', 7), (41, 'bob', 9);
DESCRIBE "TABLE1";
