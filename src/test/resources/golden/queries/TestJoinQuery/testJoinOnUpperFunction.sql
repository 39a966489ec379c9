SELECT n1.n_nationkey, n1.n_name, upper(n2.n_name) AS name
FROM nation n1 JOIN nation n2 ON n1.n_name = upper(n2.n_name)
ORDER BY n1.n_nationkey;
