SELECT region.*, n_name
FROM region CROSS JOIN nation
WHERE n_nationkey < 3
ORDER BY r_regionkey, n_name;
