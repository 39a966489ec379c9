-- reference: TestSQLAnalyzer/positive/table_subquery1.sql — union inside a
-- named table subquery, qualified star outside
DROP TABLE IF EXISTS table1;
DROP TABLE IF EXISTS table2;
CREATE TABLE table1 (key INT4, value TEXT);
CREATE TABLE table2 (key INT4, value TEXT);
INSERT INTO table1 VALUES (1, 'a'), (200, 'big');
INSERT INTO table2 VALUES (150, 'x'), (50, 'low');
SELECT unioninput.*
FROM (
  select
    table1.key,
    table1.value
  FROM
    table1
  WHERE
    table1.key < 100

  UNION ALL

  SELECT
    table2.*
  FROM
    table2
  WHERE
    table2.key > 100
) unioninput
ORDER BY unioninput.key;
