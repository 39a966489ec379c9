SELECT nation.* FROM nation WHERE n_regionkey = 2 ORDER BY n_nationkey;
