SELECT n1.n_nationkey, n1.n_name, n2.n_name AS other_name
FROM nation n1, nation n2
WHERE n1.n_name = n2.n_name AND (n1.n_nationkey IN (1, 2) OR n2.n_nationkey IN (2))
ORDER BY n1.n_nationkey;
