SELECT n_nationkey, ROUND(percent_rank() OVER (ORDER BY n_nationkey), 6) AS pr, ROUND(cume_dist() OVER (ORDER BY n_nationkey), 6) AS cd FROM nation ORDER BY n_nationkey LIMIT 10;
