SELECT n.n_name, r.r_name
FROM (SELECT * FROM nation WHERE n_nationkey < 10) n
RIGHT OUTER JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_regionkey > 2 OR n.n_name IS NULL
ORDER BY r.r_name, n.n_name;
