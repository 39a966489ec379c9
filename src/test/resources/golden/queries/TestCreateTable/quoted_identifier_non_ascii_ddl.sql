-- reference: TestCreateTable/quoted_identifier_non_ascii_ddl.sql — the
-- reference's non-ascii TABLE name: Spark's session catalog restricts
-- relation names to [A-Za-z0-9_] (SessionCatalog.validateName), so the
-- creation fails with a clean error; non-ascii COLUMN names work (see the
-- companion cases over an ascii-named table)
CREATE TABLE "테이블1" ("아이디" int, "텍스트" text, "숫자" int);
