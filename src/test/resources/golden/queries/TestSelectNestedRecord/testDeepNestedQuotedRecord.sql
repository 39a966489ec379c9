INSERT OVERWRITE INTO LOCATION '/tmp/graft_golden/nested_gloss' USING JSON SELECT named_struct('title', 'example glossary', 'GlossDiv', named_struct('title', 'S', 'GlossList', named_struct('GlossEntry', named_struct('ID', 'SGML', 'GlossTerm', 'Standard Generalized Markup Language')))) AS glossary;
DROP TABLE IF EXISTS golden_gloss;
CREATE EXTERNAL TABLE golden_gloss (glossary RECORD (title TEXT, "GlossDiv" RECORD (title TEXT, "GlossList" RECORD ("GlossEntry" RECORD ("ID" TEXT, "GlossTerm" TEXT))))) USING JSON LOCATION '/tmp/graft_golden/nested_gloss';
SELECT glossary."GlossDiv"."GlossList"."GlossEntry"."ID" AS id, glossary.title FROM golden_gloss;
