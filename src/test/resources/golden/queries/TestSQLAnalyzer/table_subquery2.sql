-- reference: TestSQLAnalyzer/positive/table_subquery2.sql (the reference
-- text joins on t2.fk, which its own subquery never projects — fk added to
-- the t2 projection so the join resolves at execution)
DROP TABLE IF EXISTS table1;
DROP TABLE IF EXISTS table2;
CREATE TABLE table1 (fk INT4);
CREATE TABLE table2 (fk INT4, name TEXT);
INSERT INTO table1 VALUES (1), (2), (3);
INSERT INTO table2 VALUES (1, 'ann'), (3, 'cho'), (4, 'dan');
SELECT
  t1.fk,
  t2.name
FROM
 (
    SELECT
      table1.fk
    FROM
      table1
 ) t1

 inner join

 (
    SELECT
      table2.fk,
      table2.name
    FROM
      table2
 ) t2

 ON t1.fk = t2.fk
ORDER BY t1.fk;
