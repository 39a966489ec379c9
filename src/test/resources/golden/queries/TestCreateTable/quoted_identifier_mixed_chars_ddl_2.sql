-- reference: TestCreateTable/quoted_identifier_mixed_chars_ddl_2.sql —
-- quoted mixed-case COLUMN names on an external text table keep their
-- exact case end-to-end (fixture written to a location first)
INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/quoted_mixed2' USING TEXT WITH ('text.delimiter'='|') SELECT 30, 'abc', 5 UNION ALL SELECT 40, 'def', 6;
DROP TABLE IF EXISTS "quotedMix2";
CREATE EXTERNAL TABLE "quotedMix2" ("aGe" int, "teXt" text, "Number" int) using text WITH ('text.delimiter'='|') location '/tmp/graft_golden/quoted_mixed2';
SELECT "aGe", "teXt", "Number" FROM "quotedMix2" ORDER BY "aGe";
