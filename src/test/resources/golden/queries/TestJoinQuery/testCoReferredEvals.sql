SELECT r_regionkey, n_regionkey, (r_regionkey + n_regionkey) AS plus
FROM region, nation
WHERE r_regionkey = n_regionkey
ORDER BY r_regionkey, n_nationkey LIMIT 20;
