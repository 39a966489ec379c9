(SELECT n1.n_nationkey, n2.n_name FROM nation n1 JOIN nation n2 ON n1.n_nationkey = n2.n_nationkey WHERE n1.n_nationkey = 1);
