-- reference: TestSQLAnalyzer/positive/join_8.sql — every join flavor
-- chained: cross, on-condition inner/outer, and the natural family.
-- Single-row tables sharing id=1 keep the twelve-way result one row.
DROP TABLE IF EXISTS table1;
DROP TABLE IF EXISTS table2;
DROP TABLE IF EXISTS table3;
DROP TABLE IF EXISTS table4;
DROP TABLE IF EXISTS table5;
DROP TABLE IF EXISTS table6;
DROP TABLE IF EXISTS table7;
DROP TABLE IF EXISTS table8;
DROP TABLE IF EXISTS table9;
DROP TABLE IF EXISTS table10;
DROP TABLE IF EXISTS table11;
DROP TABLE IF EXISTS table12;
CREATE TABLE table1 (id INT4, c1 INT4);
CREATE TABLE table2 (c2 INT4);
CREATE TABLE table3 (id INT4, c3 INT4);
CREATE TABLE table4 (id INT4, c4 INT4);
CREATE TABLE table5 (id INT4, c5 INT4);
CREATE TABLE table6 (id INT4, c6 INT4);
CREATE TABLE table7 (id INT4, c7 INT4);
CREATE TABLE table8 (id INT4, c8 INT4);
CREATE TABLE table9 (id INT4, c9 INT4);
CREATE TABLE table10 (id INT4, c10 INT4);
CREATE TABLE table11 (id INT4, c11 INT4);
CREATE TABLE table12 (id INT4, c12 INT4);
INSERT INTO table1 VALUES (1, 101);
INSERT INTO table2 VALUES (202);
INSERT INTO table3 VALUES (1, 303);
INSERT INTO table4 VALUES (1, 404);
INSERT INTO table5 VALUES (1, 505);
INSERT INTO table6 VALUES (1, 606);
INSERT INTO table7 VALUES (1, 707);
INSERT INTO table8 VALUES (1, 808);
INSERT INTO table9 VALUES (1, 909);
INSERT INTO table10 VALUES (1, 1010);
INSERT INTO table11 VALUES (1, 1111);
INSERT INTO table12 VALUES (1, 1212);
select *
  from table1
  cross join table2
  join table3 on table1.id = table3.id
  inner join table4 on table1.id = table4.id
  left outer join table5 on table1.id = table5.id
  right outer join table6 on table1.id = table6.id
  full outer join table7 on table1.id = table7.id
  natural join table8
  natural inner join table9
  natural left outer join table10
  natural right outer join table11
  natural full outer join table12;
