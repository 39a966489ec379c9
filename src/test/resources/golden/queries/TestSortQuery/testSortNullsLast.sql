SELECT NULLIF(n_regionkey, 2) AS g, n_nationkey FROM nation
ORDER BY g NULLS LAST, n_nationkey;
