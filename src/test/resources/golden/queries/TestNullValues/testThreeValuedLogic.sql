SELECT n_nationkey FROM nation
WHERE NOT (NULLIF(n_regionkey, 2) = 1) ORDER BY n_nationkey;
