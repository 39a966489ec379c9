SELECT n_nationkey FROM nation
WHERE NULLIF(n_regionkey, 0) IS NOT NULL AND n_nationkey < 12 ORDER BY n_nationkey;
