-- reference: TestCreateTable/quoted_identifier_mixed_chars_2.sql — quoted
-- aliases on quoted qualified columns
DROP TABLE IF EXISTS "TABLE1";
CREATE TABLE "TABLE1" ("aGe" int, "teXt" text, "Number" int);
INSERT INTO "TABLE1" VALUES (30, 'ann', 7), (41, 'bob', 9);
SELECT "tb1"."aGe" as "AgE", "tb1"."teXt" as "TEXT", "Number" as "NUMBER" FROM "TABLE1" "tb1" ORDER BY "AgE";
