SELECT n1.n_nationkey, substr(n1.n_name, 1, 8) name1, n2.n_nationkey AS nk2, substr(n2.n_name, 1, 8) name2
FROM nation n1 JOIN nation n2 ON substr(n1.n_name, 1, 8) = substr(n2.n_name, 1, 8)
WHERE n1.n_nationkey < 5
ORDER BY n1.n_nationkey, nk2;
