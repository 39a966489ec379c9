SELECT n1.n_nationkey, n1.n_name, n2.n_name AS n_name2
FROM nation n1 JOIN (SELECT * FROM nation UNION ALL SELECT * FROM nation) n2
  ON substr(n1.n_name, 1, 4) = substr(n2.n_name, 1, 4)
ORDER BY n1.n_nationkey, n2.n_name;
