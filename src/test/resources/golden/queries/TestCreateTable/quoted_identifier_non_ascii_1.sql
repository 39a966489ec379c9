-- reference: TestCreateTable/quoted_identifier_non_ascii_1.sql (table
-- renamed ascii — Spark's catalog cannot hold a non-ascii relation
-- name — the quoted non-ascii COLUMNS are the case under test)
DROP TABLE IF EXISTS t_hangul;
CREATE TABLE t_hangul ("아이디" int, "텍스트" text, "숫자" int);
INSERT INTO t_hangul VALUES (1, '하나', 10), (2, '둘', 20);
SELECT "아이디", "텍스트", "숫자" FROM t_hangul ORDER BY "아이디";
