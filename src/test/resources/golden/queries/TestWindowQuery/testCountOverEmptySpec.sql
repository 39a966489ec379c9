SELECT n_nationkey, COUNT(*) OVER () AS total_rows
FROM nation
WHERE n_regionkey = 3
ORDER BY n_nationkey;
