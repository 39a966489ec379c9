SELECT *, n_nationkey + 100 AS shifted FROM nation ORDER BY n_nationkey LIMIT 5;
