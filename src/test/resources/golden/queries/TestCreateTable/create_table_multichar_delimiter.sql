-- reference: tajo-storage/tajo-storage-hdfs/src/main/java/org/apache/tajo/
-- storage/text/DelimitedTextFile.java + StorageConstants.java:45-46 — a
-- MULTI-char text.delimiter and a non-default text.null token flow through
-- the DDL option mapping onto the text serde and round-trip NULLs
DROP TABLE IF EXISTS mctext1;
CREATE TABLE mctext1 (id INT8, name TEXT) USING TEXT WITH ('text.delimiter'='~|~', 'text.null'='@NULL@');
INSERT INTO mctext1 VALUES (1, 'alpha');
INSERT INTO mctext1 VALUES (2, NULL);
INSERT INTO mctext1 VALUES (3, 'gamma~tilde');
SELECT id, name FROM mctext1 ORDER BY id;
