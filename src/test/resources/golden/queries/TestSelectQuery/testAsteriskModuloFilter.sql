SELECT * FROM nation WHERE n_nationkey % 2 = 0 ORDER BY n_nationkey;
