SELECT r_name, CASE WHEN s_name IS NULL THEN 'N/O' ELSE s_name END AS s1
FROM region INNER JOIN nation ON n_regionkey = r_regionkey
LEFT OUTER JOIN supplier ON s_nationkey = n_nationkey
ORDER BY r_name, s1;
