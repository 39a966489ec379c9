SELECT n_nationkey, n_name FROM nation n1 NATURAL JOIN nation n2 ORDER BY n_nationkey LIMIT 10;
