SELECT n1.n_nationkey, n1.n_name, n2.n_name AS n_name2
FROM nation n1 JOIN nation n2 ON lower(n1.n_name) = lower(n2.n_name)
ORDER BY n1.n_nationkey;
