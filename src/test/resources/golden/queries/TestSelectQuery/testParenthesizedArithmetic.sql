SELECT n_nationkey, (n_nationkey + 2) * 3 AS a, n_nationkey + 2 * 3 AS b, ((n_nationkey)) AS c FROM nation ORDER BY n_nationkey LIMIT 6;
