SELECT n_name FROM nation WHERE n_nationkey IN (SELECT count(*) FROM region) ORDER BY n_name;
