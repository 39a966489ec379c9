SELECT n1.n_nationkey, substr(n1.n_name, 1, 8) AS name1, substr(n2.n_name, 1, 8) AS name2
FROM nation n1 JOIN nation n2 ON substr(n1.n_name, 1, 8) = substr(n2.n_name, 1, 8)
ORDER BY n1.n_nationkey, name2 LIMIT 30;
