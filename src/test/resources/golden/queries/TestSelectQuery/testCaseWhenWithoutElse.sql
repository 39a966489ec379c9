SELECT n_nationkey, CASE WHEN n_regionkey = 0 THEN 'zero' WHEN n_regionkey = 1 THEN 'one' END AS label FROM nation ORDER BY n_nationkey LIMIT 12;
