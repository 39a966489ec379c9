SELECT * FROM region, nation
ORDER BY r_regionkey, n_nationkey
LIMIT 20;
