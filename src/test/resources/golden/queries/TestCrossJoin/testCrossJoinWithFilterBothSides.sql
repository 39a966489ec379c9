SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
WHERE r.r_regionkey > 2 AND n.n_nationkey < 4
ORDER BY r.r_name, n.n_name;
