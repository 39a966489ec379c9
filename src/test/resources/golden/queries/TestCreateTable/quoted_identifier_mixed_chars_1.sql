-- reference: TestCreateTable/quoted_identifier_mixed_chars_1.sql
DROP TABLE IF EXISTS "TABLE1";
CREATE TABLE "TABLE1" ("aGe" int, "teXt" text, "Number" int);
INSERT INTO "TABLE1" VALUES (30, 'ann', 7), (41, 'bob', 9);
SELECT "aGe", "teXt", "Number" FROM "TABLE1" ORDER BY "aGe";
