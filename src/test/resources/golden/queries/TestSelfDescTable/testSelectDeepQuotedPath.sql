-- reference: TestQueryOnSelfDescTable/testSelect2.sql shape — mixed-case
-- QUOTED nested field names addressed by deep dot-paths, filtered on the
-- deepest field
DROP TABLE IF EXISTS sd_glossary;
CREATE EXTERNAL TABLE sd_glossary (glossary RECORD (title TEXT, "GlossDiv" RECORD (title TEXT, "SortAs" TEXT, "Abbrev" TEXT))) USING JSON LOCATION '/tmp/graft_golden/selfdesc_glossary';
INSERT OVERWRITE INTO sd_glossary SELECT named_struct('title', 'example glossary', 'GlossDiv', named_struct('title', 'S', 'SortAs', 'SGML', 'Abbrev', 'ISO 8879:1986'));
DROP TABLE IF EXISTS sd_g;
CREATE EXTERNAL TABLE sd_g USING JSON LOCATION '/tmp/graft_golden/selfdesc_glossary';
SELECT
  glossary.title,
  glossary."GlossDiv".title,
  glossary."GlossDiv"."SortAs"
FROM sd_g
WHERE glossary."GlossDiv"."Abbrev" = 'ISO 8879:1986';
