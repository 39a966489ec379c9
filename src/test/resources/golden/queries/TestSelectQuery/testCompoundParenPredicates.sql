SELECT n_nationkey, n_name FROM nation
WHERE ((n_regionkey = 1 OR n_regionkey = 3) AND n_nationkey > 4)
   OR (n_regionkey = 0 AND (n_nationkey = 0 OR n_nationkey = 20))
ORDER BY n_nationkey;
