SELECT n_nationkey, upper(n_name) AS up, substr(n_name, 1, 3) AS pre, length(n_name) AS len
FROM nation WHERE n_regionkey = 0 ORDER BY n_nationkey;
