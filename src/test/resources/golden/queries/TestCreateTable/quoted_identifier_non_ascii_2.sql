-- reference: TestCreateTable/quoted_identifier_non_ascii_2.sql — quoted
-- and unquoted aliases, quoted table alias with a space
DROP TABLE IF EXISTS t_hangul;
CREATE TABLE t_hangul ("아이디" int, "텍스트" text, "숫자" int);
INSERT INTO t_hangul VALUES (1, '하나', 10), (2, '둘', 20);
SELECT "아이디" as "진짜아이디", "텍스트" as text, "숫자" FROM t_hangul as "테이블 별명" ORDER BY "진짜아이디";
