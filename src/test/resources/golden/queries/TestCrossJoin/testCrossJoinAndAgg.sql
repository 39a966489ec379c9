SELECT r.r_name, COUNT(*) AS pairs, SUM(CAST(n.n_nationkey AS INT8)) AS key_sum
FROM region r CROSS JOIN nation n
WHERE n.n_nationkey < 5
GROUP BY r.r_name
ORDER BY r.r_name;
