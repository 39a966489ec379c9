SELECT n.n_nationkey, n.n_name, t.cnt
FROM nation n
JOIN (
  SELECT r.r_regionkey, COUNT(*) AS cnt
  FROM nation n2 JOIN region r ON n2.n_regionkey = r.r_regionkey
  GROUP BY r.r_regionkey
) t ON n.n_regionkey = t.r_regionkey AND n.n_nationkey > t.cnt
ORDER BY n.n_nationkey;
