SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 0;
