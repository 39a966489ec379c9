SELECT * FROM region JOIN nation ON n_regionkey = r_regionkey ORDER BY n_nationkey LIMIT 8;
