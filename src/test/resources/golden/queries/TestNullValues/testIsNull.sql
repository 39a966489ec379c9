SELECT n_nationkey, NULLIF(n_regionkey, 0) AS g FROM nation
WHERE NULLIF(n_regionkey, 0) IS NULL ORDER BY n_nationkey;
