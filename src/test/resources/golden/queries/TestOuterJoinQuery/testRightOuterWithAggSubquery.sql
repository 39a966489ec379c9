SELECT r.r_name, t.nations
FROM (SELECT n_regionkey, COUNT(*) AS nations FROM nation WHERE n_nationkey < 10 GROUP BY n_regionkey) t
RIGHT OUTER JOIN region r ON t.n_regionkey = r.r_regionkey
ORDER BY r.r_name;
