SELECT n1.n_nationkey, substr(n1.n_name, 1, 4) name1, substr(n2.n_name, 1, 4) name2
FROM nation n1 JOIN (SELECT * FROM nation WHERE n_nationkey < 10) n2
  ON substr(n1.n_name, 1, 4) = substr(n2.n_name, 1, 4)
ORDER BY n1.n_nationkey;
