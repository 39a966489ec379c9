-- reference: TestCreateTable/quoted_identifier_mixed_chars_3.sql — union
-- of quoted-identifier selects
DROP TABLE IF EXISTS "TABLE1";
CREATE TABLE "TABLE1" ("aGe" int, "teXt" text, "Number" int);
INSERT INTO "TABLE1" VALUES (30, 'ann', 7), (41, 'bob', 9);
SELECT
  *
FROM (
  SELECT
    "tb1"."aGe",
    "tb1"."teXt",
    "Number"
  FROM
    "TABLE1" "tb1"
  UNION
  SELECT
    "aGe",
    "teXt",
    "Number"
  FROM
    "TABLE1"
) t
ORDER BY "aGe";
