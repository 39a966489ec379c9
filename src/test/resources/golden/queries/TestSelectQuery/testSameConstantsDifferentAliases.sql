SELECT 100 AS a, 100 AS b, 'xyz' AS s1, 'xyz' AS s2, n_nationkey FROM nation ORDER BY n_nationkey LIMIT 3;
