-- reference: TestCreateTable/quoted_identifier_non_ascii_3.sql — bare
-- (AS-less) quoted aliases and an expression over a non-ascii column
DROP TABLE IF EXISTS t_hangul;
CREATE TABLE t_hangul ("아이디" int, "텍스트" text, "숫자" int);
INSERT INTO t_hangul VALUES (1, '하나', 10), (2, '둘', 20);
SELECT "아이디" "진짜아이디", char_length("텍스트") as "길이", "숫자" * 2 FROM t_hangul "테이블 별명" ORDER BY "진짜아이디";
