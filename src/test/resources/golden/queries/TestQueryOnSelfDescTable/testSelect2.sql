SET spark.sql.jsonGenerator.ignoreNullFields=false;
DROP TABLE IF EXISTS sd2_stage;
CREATE EXTERNAL TABLE sd2_stage (glossary RECORD (title TEXT, "GlossDiv" RECORD (title TEXT, null_expected TEXT, "GlossList" RECORD ("GlossEntry" RECORD ("SortAs" TEXT, "Abbrev" TEXT))))) USING JSON LOCATION '/tmp/graft_golden/sd2';
INSERT OVERWRITE INTO sd2_stage SELECT named_struct('title', 'example glossary', 'GlossDiv', named_struct('title', 'S', 'null_expected', CAST(NULL AS STRING), 'GlossList', named_struct('GlossEntry', named_struct('SortAs', 'SGML', 'Abbrev', 'ISO 8879:1986'))));
DROP TABLE IF EXISTS self_desc_table2;
CREATE EXTERNAL TABLE self_desc_table2 USING JSON LOCATION '/tmp/graft_golden/sd2';
SELECT glossary.title, glossary."GlossDiv".title, glossary."GlossDiv".null_expected,
  glossary."GlossDiv"."GlossList"."GlossEntry"."SortAs"
FROM self_desc_table2
WHERE glossary."GlossDiv"."GlossList"."GlossEntry"."Abbrev" = 'ISO 8879:1986';
