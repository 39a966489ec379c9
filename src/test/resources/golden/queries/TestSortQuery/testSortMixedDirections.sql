SELECT n_regionkey, n_nationkey FROM nation ORDER BY n_regionkey ASC, n_nationkey DESC LIMIT 12;
