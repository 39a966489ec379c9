SELECT r_regionkey, n_nationkey FROM region, nation WHERE r_regionkey < n_regionkey ORDER BY r_regionkey, n_nationkey LIMIT 25;
