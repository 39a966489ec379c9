SELECT r_regionkey, e.n_nationkey
FROM region FULL OUTER JOIN (SELECT * FROM nation WHERE n_nationkey < 0) e ON r_regionkey = e.n_regionkey
ORDER BY r_regionkey;
