-- reference: TestSQLAnalyzer/positive/set_4.sql — a 4-branch UNION ALL of
-- joins between filtered derived tables, wrapped in an outer derived table
SELECT * FROM (
  SELECT a.nname, b.rname
  FROM (SELECT n_name AS nname, n_regionkey AS id FROM nation WHERE n_nationkey < 7) AS a
  JOIN (SELECT r_regionkey AS id, r_name AS rname FROM region WHERE r_name = 'AFRICA') AS b ON a.id = b.id
  UNION ALL
  SELECT a.nname, b.rname
  FROM (SELECT n_name AS nname, n_regionkey AS id FROM nation WHERE n_nationkey < 9) AS a
  JOIN (SELECT r_regionkey AS id, r_name AS rname FROM region WHERE r_name = 'AMERICA') AS b ON a.id = b.id
  UNION ALL
  SELECT a.nname, b.rname
  FROM (SELECT n_name AS nname, n_regionkey AS id FROM nation WHERE n_nationkey < 11) AS a
  JOIN (SELECT r_regionkey AS id, r_name AS rname FROM region WHERE r_name = 'ASIA') AS b ON a.id = b.id
  UNION ALL
  SELECT a.nname, b.rname
  FROM (SELECT n_name AS nname, n_regionkey AS id FROM nation WHERE n_nationkey < 13) AS a
  JOIN (SELECT r_regionkey AS id, r_name AS rname FROM region WHERE r_name = 'EUROPE') AS b ON a.id = b.id
) AS t
ORDER BY rname, nname;
